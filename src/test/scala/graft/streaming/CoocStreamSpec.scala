package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming co-occurrence maintenance: cross-batch pair counts equal the
  * order-independent batch ground truth when the cap does not bind, and the
  * cap bounds both state and emission when it does. */
class CoocStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Order-independent ground truth: every unordered item pair a user holds
    * co-occurs exactly once (items are distinct per user). */
  private def brute(rows: Seq[(Long, Int)]): Map[(Int, Int), Int] =
    rows.distinct.groupBy(_._1).values.flatMap { g =>
      val items = g.map(_._2).distinct
      for (a <- items; b <- items if a < b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size).toMap

  test("accumulated pair counts equal the batch cooc over all batches, " +
       "independent of batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq((1L, 10), (1L, 20), (2L, 10), (2L, 30))
    val batch2 = Seq((1L, 30), (2L, 20), (3L, 10), (1L, 10) /* repeat: no-op */)
    val batch3 = Seq((3L, 30), (2L, 40))

    val input = MemoryStream[(Long, Int)]
    val q = Streams.coocStream(input.toDS()).toDF("i", "j")
      .writeStream.format("memory").queryName("cooc").outputMode("append").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      input.addData(batch3: _*); q.processAllAvailable()
      val got = spark.table("cooc").as[(Int, Int)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got === brute(batch1 ++ batch2 ++ batch3))
      // canonical orientation throughout
      assert(got.keys.forall { case (a, b) => a < b })
    } finally q.stop()
  }

  test("the cap bounds state and emission in arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Int)]
    val q = Streams.coocStream(input.toDS(), cap = 3).toDF("i", "j")
      .writeStream.format("memory").queryName("cooc_cap").outputMode("append").start()
    try {
      input.addData(Seq((7L, 1), (7L, 2), (7L, 3)): _*); q.processAllAvailable()
      // 4 and 5 arrive after the cap: no pairs may involve them
      input.addData(Seq((7L, 4), (7L, 5)): _*); q.processAllAvailable()
      val got = spark.table("cooc_cap").as[(Int, Int)].collect().toSet
      assert(got === Set((1, 2), (1, 3), (2, 3)))
    } finally q.stop()
  }
}
