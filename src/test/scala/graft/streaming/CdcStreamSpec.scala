package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CDC merge: cross-batch last-writer-wins state, tombstone
  * semantics, replay idempotence, and parity with the batch
  * [[graft.queries.EventQueries.cdcMerge]] on the same change set. */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  // (key, tsMillis, eventId, changeType, valueScaled)
  private type Chg = (Long, Long, Long, String, Option[Long])

  private def run(batches: Seq[Chg]*): Map[Long, (String, Option[Long], Long, Boolean)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Chg]
    val name = s"cdc_${System.nanoTime()}"
    val q = Streams.cdcStream(input.toDS())
      .toDF("key", "state_type", "value_scaled", "updated_ms", "deleted")
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // Update-mode memory sink keeps every emission; latest per key wins
      spark.table(name)
        .as[(Long, String, Option[Long], Long, Boolean)].collect()
        .groupBy(_._1).view
        .mapValues(_.maxBy(_._4))
        .map { case (k, r) => k -> ((r._2, r._3, r._4, r._5)) }.toMap
    } finally q.stop()
  }

  test("cross-batch latest wins; tombstones delete and can be superseded") {
    val got = run(
      Seq((1L, 100L, 1L, "view", Some(10L)), (2L, 100L, 2L, "view", Some(20L))),
      Seq((1L, 200L, 3L, "purchase", Some(11L)), (2L, 200L, 4L, "error", None)),
      Seq((2L, 300L, 5L, "click", Some(22L)), (3L, 300L, 6L, "signup", Some(30L))))
    assert(got(1L) === (("purchase", Some(11L), 200L, false)))
    // user 2's tombstone was superseded by the later click
    assert(got(2L) === (("click", Some(22L), 300L, false)))
    assert(got(3L) === (("signup", Some(30L), 300L, false)))
  }

  test("a key whose LAST change is a tombstone surfaces deleted=true") {
    val got = run(
      Seq((7L, 100L, 1L, "view", Some(1L))),
      Seq((7L, 200L, 2L, "error", None)))
    assert(got(7L)._4 === true)
    assert(got(7L)._3 === 200L)
  }

  test("replayed and reordered changes never overwrite newer state") {
    val got = run(
      Seq((5L, 500L, 9L, "purchase", Some(99L))),
      // a full replay of an OLDER change plus an out-of-order tombstone
      Seq((5L, 100L, 1L, "view", Some(1L)), (5L, 400L, 8L, "error", None)),
      Seq((5L, 500L, 9L, "purchase", Some(99L)))) // exact duplicate replay
    assert(got(5L) === (("purchase", Some(99L), 500L, false)))
  }

  test("stream state equals the batch cdcMerge on the fixture change set") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // mirrors the batch operator's framing: pre-cutoff rows are batch 1
    // (the snapshot build), post-cutoff rows arrive split across batches
    val rows = Seq(
      (1L, t("2024-01-10 00:00:00"), 1L, "view", 1.0),
      (2L, t("2024-01-10 01:00:00"), 1L, "click", 2.0),
      (3L, t("2024-01-20 00:00:00"), 1L, "purchase", 3.0),
      (4L, t("2024-01-10 00:00:00"), 2L, "view", 1.0),
      (5L, t("2024-01-20 00:00:00"), 2L, "error", 1.0),
      (6L, t("2024-01-10 00:00:00"), 3L, "signup", 7.0),
      (7L, t("2024-01-20 00:00:00"), 4L, "view", 4.0),
      (8L, t("2024-01-20 00:00:00"), 5L, "error", 1.0),
      (9L, t("2024-01-20 01:00:00"), 5L, "click", 5.0))
    val tmp = java.nio.file.Files.createTempDirectory("cdcs").toString
    rows.map { case (id, ts, u, typ, v) => (id, ts, u, typ, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val batch = graft.queries.EventQueries.cdcMerge(spark, tmp)
      .as[(Long, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, Option(r._3), r._4))).toMap

    val chg: Seq[Chg] = rows.map { case (id, ts, u, typ, v) =>
      (u, ts.getTime, id, typ, Some(math.floor(v * 1000).toLong): Option[Long])
    }
    val cut = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime
    val (pre, post) = chg.partition(_._2 < cut)
    val streamed = run(pre, post.take(3), post.drop(3))
    val live = streamed.filter(!_._2._4)
      .map { case (k, (typ, v, ts, _)) => k -> ((typ, v, ts)) }
    assert(live === batch,
      "non-deleted stream state must equal the batch MERGE result")
    // and the deleted key is exactly the one the batch result dropped
    assert(streamed.keySet -- live.keySet === Set(2L))
  }
}
