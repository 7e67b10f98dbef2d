package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hot-reload semantics of the enrichment dim (the
  * `ExternalDatabaseLookupService` analog): republishing the dim is picked
  * up without a session restart; an unchanged dim never re-reads. */
class RefreshableDimSpec extends SparkSpec {
  import spark.implicits._

  test("a republished dim swaps in; an unchanged dim stays cached") {
    val dim = java.nio.file.Files.createTempDirectory("refresh-dim").toString
    Seq((167772160L, 167772415L, "NL")).toDF("ip_start", "ip_end", "country")
      .coalesce(1).write.mode("overwrite").parquet(dim)
    val ev = Seq(("e1", "10.0.0.7")).toDF("event_id", "ip")

    def enrich() = GeoIp.enrichPrefix(ev, "ip", RefreshableDim.current(spark, dim))
      .select("event_id", "country").as[(String, String)].collect().toSeq

    assert(enrich() === Seq(("e1", "NL")))

    // unchanged files → the SAME cached frame instance (no re-read)
    val before = RefreshableDim.current(spark, dim)
    assert(RefreshableDim.current(spark, dim) eq before)

    // republish (new content, new part-file names) → next lookup swaps
    Seq((167772160L, 167772415L, "BE")).toDF("ip_start", "ip_end", "country")
      .coalesce(1).write.mode("overwrite").parquet(dim)
    assert(enrich() === Seq(("e1", "BE")))
    assert(!(RefreshableDim.current(spark, dim) eq before))

    // streaming pickup: foreachBatch re-resolves the dim per micro-batch
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = input.toDF.toDF("ip").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= GeoIp.enrichPrefix(batch, "ip", RefreshableDim.current(spark, dim))
          .select("country").as[String](org.apache.spark.sql.Encoders.STRING)
          .collect()
        ()
    }.start()
    input.addData("10.0.0.9")
    q.processAllAvailable()
    Seq((167772160L, 167772415L, "FR")).toDF("ip_start", "ip_end", "country")
      .coalesce(1).write.mode("overwrite").parquet(dim)
    input.addData("10.0.0.9")
    q.processAllAvailable()
    q.stop()
    assert(seen.toSeq === Seq("BE", "FR")) // second batch saw the republished db
    RefreshableDim.invalidate(spark, dim)
  }
}
