package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Cross-batch streaming top-k: after every micro-batch, each group's
  * emission must equal the BATCH aggregator over the union of all batches
  * so far (the state is literally the batch aggregator's buffer). */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._

  private def batchTopK(rows: Seq[(String, Double, Long)], k: Int): Set[(String, Int, Long, Double)] = {
    val agg = new graft.functions.TopK.TopKByValue(k)
    rows.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      val buf = rs.foldLeft(agg.zero) { case (b, (_, v, id)) => agg.reduce(b, (v, id)) }
      buf.zipWithIndex.map { case ((v, id), i) => (t, i + 1, id, v) }
    }.toSet
  }

  test("streaming emissions equal batch top-k over each prefix of batches") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(("click", 5.0, 1L), ("click", 9.0, 2L), ("view", 3.0, 3L),
      ("click", 7.0, 4L), ("click", 1.0, 5L))
    val batch2 = Seq(("click", 8.0, 6L), ("view", 3.0, 7L), ("click", 0.5, 8L),
      ("purchase", 2.0, 9L))

    val input = MemoryStream[(String, Double, Long)]
    val q = Streams.topKStream(
        input.toDS().toDF("event_type", "value", "event_id"), k = 3)
      .writeStream.format("memory").queryName("topk").outputMode("update").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      val after1 = spark.table("topk").as[(String, Int, Long, Double)].collect().toSet
      assert(after1 === batchTopK(batch1, 3))

      input.addData(batch2: _*); q.processAllAvailable()
      val all = spark.table("topk").as[(String, Int, Long, Double)].collect().toSet
      // memory sink accumulates: batch-1 emissions plus batch-2 emissions
      assert(all === batchTopK(batch1, 3) ++ batchTopK(batch1 ++ batch2, 3))
      // value ties rank by id: the two 3.0 'view' rows order as (3, then 7)
      assert(all.contains(("view", 1, 3L, 3.0)) && all.contains(("view", 2, 7L, 3.0)))
      // bounded state: no group ever emits more than k rows per batch
      assert(spark.table("topk").groupBy("event_type", "rank").count()
        .collect().forall(_.getLong(2) <= 2))
    } finally q.stop()
  }
}
