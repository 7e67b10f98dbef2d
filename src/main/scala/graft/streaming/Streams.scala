package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the engine's stateful operators
  * (SURVEY.md §2D). The transforms are the SAME expressions as the batch
  * layer — a streaming DataFrame flows through unchanged decode/mapping
  * stages (the reference's source→mapping→sink spine,
  * `IncomingRequestProcessor.java:140-164`); only the stateful tail differs:
  * watermarked session windows and within-watermark dedup.
  */
object Streams {

  /** Sliding-inactivity sessionization (30-min default, reference
    * `BrowserSourceConfiguration.java:40`): `session_window` under a
    * watermark; emits one row per closed session. State is keyed by
    * (partyId, window) and scales horizontally with the shuffle. */
  def sessionize(events: DataFrame, partyCol: String, tsCol: String,
                 gap: String = "30 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(partyCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
      .select(col(partyCol), col("n_events"), col("session_start"), col("session_end"))

  /** Duplicate REMOVAL in streaming: state-bounded exact dedup on the event
    * key within the watermark horizon — the filtering counterpart of the
    * reference's flag-only memory (`Mapping.java:102-126`
    * discard_duplicates). */
  def dropDuplicates(events: DataFrame, tsCol: String, keyCols: Seq[String],
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Windowed event-rate rollup (the monitoring aggregate the reference
    * delegates downstream): tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame, tsCol: String, typeCol: String,
                     window: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(typeCol), col("n"))
}
