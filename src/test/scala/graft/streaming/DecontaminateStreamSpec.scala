package graft.streaming

import graft.SparkSpec
import graft.queries.DocQueries

/** Streaming decontamination: per-batch Bloom probe against a hot-reloaded
  * benchmark publication — cross-batch parity with the batch operator, a
  * mid-stream benchmark-set refresh picked up at the next micro-batch, and
  * the no-false-negative contract. */
class DecontaminateStreamSpec extends SparkSpec {
  import spark.implicits._

  private def publishBench(dir: String, fps: Seq[String]): Unit =
    fps.toDF("fingerprint").repartition(1)
      .write.mode("overwrite").parquet(dir)

  test("stream flags match the batch Bloom operator per batch, and a " +
       "republished benchmark set applies from the next micro-batch") {
    val benchDir = java.nio.file.Files
      .createTempDirectory("graft-bench-dim").toString + "/bench"
    publishBench(benchDir, Seq("fp2", "fp4"))
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = input.toDF.toDF("doc_id", "fingerprint").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= Streams.decontaminateBatch(batch, benchDir)
          .select("doc_id", "maybe_contaminated")
          .as[(Long, Boolean)].collect().sortBy(_._1)
        ()
    }.start()
    try {
      val batch1 = Seq(1L -> "fp1", 2L -> "fp2", 3L -> "fp3",
        4L -> "fp4", 5L -> "fp5", 6L -> "fp6")
      input.addData(batch1: _*)
      q.processAllAvailable()
      // parity: the stream's flags equal the BATCH Bloom operator run over
      // the same rows and the same publication (identical filter: same
      // items, same expectedNumItems/fpp → same deterministic bitset)
      val batchFlags = DocQueries.flagContaminatedBloom(
          batch1.toDF("doc_id", "fingerprint"),
          spark.read.parquet(benchDir), "fingerprint")
        .select("doc_id", "maybe_contaminated")
        .as[(Long, Boolean)].collect().sortBy(_._1)
      assert(seen.toSeq === batchFlags.toSeq)
      // no false negatives on the planted members
      assert(seen.filter(_._2).map(_._1).toSet.intersect(Set(2L, 4L)) === Set(2L, 4L))

      // republish mid-stream: fp2/fp4 leave the set, fp5 enters
      publishBench(benchDir, Seq("fp5"))
      seen.clear()
      input.addData(Seq(11L -> "fp2", 12L -> "fp4", 13L -> "fp5",
        14L -> "fp7"): _*)
      q.processAllAvailable()
      val flagged = seen.filter(_._2).map(_._1).toSet
      assert(flagged.contains(13L), "new member must flag (no false negatives)")
      assert(!flagged.contains(11L) && !flagged.contains(12L),
        "retired members must stop flagging once the republished set loads")
    } finally {
      q.stop()
      graft.functions.RefreshableDim.invalidate(spark, benchDir)
    }
  }
}
