package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Cross-batch streaming funnel: the stage pointer follows event time
  * WITHIN a batch (shuffle arrival order can never change results),
  * arrival order ACROSS batches (no rewind on cross-batch late data),
  * and matches an independent fold replaying the same contract. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, ts, id)
  private type Ev = (Long, String, Long, Long)

  private def reference(batches: Seq[Seq[Ev]],
      stages: Seq[String]): Map[Long, (Int, Option[Long])] = {
    val out = scala.collection.mutable.Map.empty[Long, (Int, Long)]
    for (b <- batches) {
      b.groupBy(_._1).foreach { case (u, rows) =>
        var (stage, lastTs) = out.getOrElse(u, (0, Long.MinValue))
        rows.sortBy(r => (r._3, r._4)).foreach { case (_, t, ts, _) =>
          if (stage < stages.length && t == stages(stage) && ts >= lastTs) {
            stage += 1; lastTs = ts
          }
        }
        out(u) = (stage, lastTs)
      }
    }
    out.map { case (u, (s, ts)) => u -> (s, if (s == 0) None else Some(ts)) }.toMap
  }

  test("stage progression, within-batch event-time order, cross-batch no-rewind") {
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("view", "click", "purchase")
    // user 1: full funnel across two batches
    // user 2: click BEFORE view in event time within one batch -> stalls at view
    // user 3: completes view+click in batch 1; batch 2 brings a purchase
    //         EARLIER than the click (cross-batch late) -> must NOT count
    val b1: Seq[Ev] = Seq(
      (1L, "view", 100L, 1L), (1L, "click", 200L, 2L),
      (2L, "click", 50L, 3L), (2L, "view", 60L, 4L),
      (3L, "view", 10L, 5L), (3L, "click", 20L, 6L))
    val b2: Seq[Ev] = Seq(
      (1L, "purchase", 300L, 7L),
      (2L, "click", 70L, 8L),
      (3L, "purchase", 15L, 9L))
    val input = MemoryStream[Ev]
    val q = Streams.funnelStream(
        input.toDS().toDF("user_id", "event_type", "ts_ms", "event_id"))
      .writeStream.format("memory").queryName("funnel").outputMode("update").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // update mode accumulates; latest emission per user = max stage row
      val latest = spark.table("funnel")
        .as[(Long, Int, Option[Long])].collect()
        .groupBy(_._1).map { case (u, rs) => u -> rs.maxBy(_._2) }
      val exp = reference(Seq(b1, b2), stages)
      assert(latest(1L)._2 === 3 && latest(1L)._3 === Some(300L))
      assert(latest(2L)._2 === 2, "event-time order within batch: view@60 then click@70")
      assert(latest(3L)._2 === 2, "cross-batch late purchase must not rewind-count")
      exp.foreach { case (u, (s, ts)) =>
        assert((latest(u)._2, latest(u)._3) === ((s, ts)), s"user $u vs reference")
      }
    } finally q.stop()
  }
}
