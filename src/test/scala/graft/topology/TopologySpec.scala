package graft.topology

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wiring permutations from the reference's topology fixtures
  * (`ServerSinkSourceConfigurationTest.java`): shared sources, shared sinks,
  * schema-conflict rejection, discard flags. */
class TopologySpec extends SparkSpec {
  import spark.implicits._

  private def events: DataFrame = Seq(
    ("e1", false, false), ("e2", true, false), ("e3", false, true)
  ).toDF("eventId", "detectedCorruption", "detectedDuplicate")

  private val passThrough: DataFrame => DataFrame = identity

  test("many-to-many fan-out: one source, two mappings, shared sink") {
    val t = new Topology(
      mappings = Seq(
        MappingSpec("m1", Seq("browser"), passThrough, "schemaA"),
        MappingSpec("m2", Seq("browser"), _.withColumn("eventId", upper(col("eventId"))), "schemaA")),
      sinks = Seq(SinkSpec("hdfs", Seq("m1", "m2")), SinkSpec("kafka", Seq("m1"))))
    val out = t(Map("browser" -> events))
    assert(out("hdfs").count() === 6) // union of both mappings
    assert(out("kafka").count() === 3)
  }

  test("discard flags filter corrupt/duplicate events per mapping") {
    val t = new Topology(
      mappings = Seq(MappingSpec("m", Seq("src"), passThrough, "s",
        discardCorrupted = true, discardDuplicates = true)),
      sinks = Seq(SinkSpec("out", Seq("m"))))
    val rows = t(Map("src" -> events))("out").select("eventId").as[String].collect()
    assert(rows === Array("e1"))
  }

  test("schema conflict on a shared sink is rejected at construction") {
    val e = intercept[IllegalArgumentException] {
      new Topology(
        mappings = Seq(
          MappingSpec("m1", Seq("s"), passThrough, "schemaA"),
          MappingSpec("m2", Seq("s"), passThrough, "schemaB")),
        sinks = Seq(SinkSpec("shared", Seq("m1", "m2"))))
    }
    assert(e.getMessage.contains("multiple schemas"))
  }

  test("unknown mapping reference is rejected") {
    intercept[IllegalArgumentException] {
      new Topology(Seq.empty, Seq(SinkSpec("s", Seq("ghost"))))
    }
  }

  test("NULL discard flags keep the row; heterogeneous sources union by name") {
    // a JSON-shaped source has no transport duplicate column -> the
    // mapping surfaces detectedDuplicate = NULL; discard must treat NULL
    // as false (the reference's primitive-boolean default), not drop ALL
    val jsonish = Seq(("j1", false), ("j2", false))
      .toDF("eventId", "detectedCorruption")
      .withColumn("detectedDuplicate", lit(null).cast("boolean"))
      .withColumn("bodyOversized", lit(false))
    val browserish = Seq(("b1", false, false))
      .toDF("eventId", "detectedCorruption", "detectedDuplicate")
    val t = new Topology(
      mappings = Seq(MappingSpec("m", Seq("browser", "json"), passThrough,
        "schemaA", discardCorrupted = true, discardDuplicates = true)),
      sinks = Seq(SinkSpec("hdfs", Seq("m"))))
    val out = t(Map("browser" -> browserish, "json" -> jsonish))
    // 1 browser + 2 json rows survive; the browser row's missing
    // bodyOversized unions in as NULL rather than failing analysis
    assert(out("hdfs").select("eventId").as[String].collect().sorted
      === Array("b1", "j1", "j2"))
  }

  test("a sink naming no mappings defaults to all; duplicate sink names reject") {
    val t = new Topology(
      mappings = Seq(
        MappingSpec("m1", Seq("browser"), passThrough, "schemaA"),
        MappingSpec("m2", Seq("browser"), passThrough, "schemaA")),
      sinks = Seq(SinkSpec("hdfs", Seq.empty)))
    assert(t(Map("browser" -> events))("hdfs").count() === 6)
    assertThrows[IllegalArgumentException] {
      new Topology(
        mappings = Seq(MappingSpec("m1", Seq("browser"), passThrough, "schemaA")),
        sinks = Seq(SinkSpec("hdfs", Seq("m1")), SinkSpec("hdfs", Seq("m1"))))
    }
  }
}
