package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** The UA rule database under Structured Streaming — the other half of the
  * reference's hot-swap story (`ExternalDatabaseLookupService` watches the
  * file and swaps the reader under live traffic): a rewritten regexes.yaml
  * is picked up between micro-batches with no query restart, because the
  * stamp check runs inside the executor-side parse and the LRU keys fold
  * in the stamp. */
class UaDatabaseStreamSpec extends SparkSpec {

  private def yamlFor(family: String) =
    s"""user_agent_parsers:
       |  - regex: 'Edg/(\\d+)\\.(\\d+)'
       |    family_replacement: '$family'
       |""".stripMargin

  test("streaming UA enrichment sees a republished rule file at the next " +
       "micro-batch") {
    val prev = sys.props.put("graft.ua.db.refresh.ms", "1")
    val file = java.io.File.createTempFile("ua-stream", ".yaml")
    try {
      java.nio.file.Files.writeString(file.toPath, yamlFor("Edge One"))
      val path = file.getAbsolutePath
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val uaCol = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        UaParse(org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("ua")),
          Some(path)))
      val seen = scala.collection.mutable.ArrayBuffer.empty[String]
      val q = input.toDF.toDF("ua").writeStream.foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          seen ++= batch.withColumn("u", uaCol)
            .select("u.name").as[String](org.apache.spark.sql.Encoders.STRING)
            .collect()
          ()
      }.start()
      input.addData("z Edg/120.0 q")
      q.processAllAvailable()
      Thread.sleep(5) // past the shrunk refresh window
      java.nio.file.Files.writeString(file.toPath, yamlFor("Edge Two"))
      file.setLastModified(file.lastModified() + 2000) // defeat mtime granularity
      input.addData("z Edg/120.0 q")
      q.processAllAvailable()
      q.stop()
      assert(seen.toSeq === Seq("Edge One", "Edge Two"),
        "second micro-batch must classify through the republished rules")
    } finally {
      file.delete()
      prev match {
        case Some(v) => sys.props.put("graft.ua.db.refresh.ms", v)
        case None => sys.props.remove("graft.ua.db.refresh.ms")
      }
    }
  }

  test("a failed refresh keeps serving the cached rules instead of failing " +
       "the task (reference reloadDatabase catch-and-keep-old)") {
    val prev = sys.props.put("graft.ua.db.refresh.ms", "1")
    val file = java.io.File.createTempFile("ua-fail", ".yaml")
    try {
      java.nio.file.Files.writeString(file.toPath, yamlFor("Edge One"))
      val path = file.getAbsolutePath
      assert(UaDatabase.classify(UaDatabase.current(path), "z Edg/120.0 q").family == "Edge One")
      Thread.sleep(5)
      // refresh window expired AND the file is gone: statStamp throws
      // inside the elected refresher — rows must keep classifying
      assert(file.delete())
      val hit = UaDatabase.classify(UaDatabase.current(path), "z Edg/120.0 q")
      assert(hit.family == "Edge One",
        "vanished file mid-refresh must fall back to the cached database")
      Thread.sleep(5)
      // the file returns with new rules: the NEXT refresh picks them up
      // (the failure must not wedge the refresh loop)
      java.nio.file.Files.writeString(file.toPath, yamlFor("Edge Two"))
      file.setLastModified(System.currentTimeMillis() + 3000) // defeat mtime granularity
      Thread.sleep(5)
      var fam = ""
      // two current() calls: the first past-deadline call re-stats (may
      // still observe the old stamp on coarse mtime clocks), the loop
      // tolerates clock granularity
      val deadline = System.nanoTime() + 2000000000L
      while (fam != "Edge Two" && System.nanoTime() < deadline) {
        Thread.sleep(5)
        fam = UaDatabase.classify(UaDatabase.current(path), "z Edg/120.0 q").family
      }
      assert(fam == "Edge Two", "refresh loop must recover after a failure")
    } finally {
      file.delete()
      prev match {
        case Some(v) => sys.props.put("graft.ua.db.refresh.ms", v)
        case None => sys.props.remove("graft.ua.db.refresh.ms")
      }
    }
  }
}
