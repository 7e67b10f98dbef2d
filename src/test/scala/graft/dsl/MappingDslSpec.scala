package graft.dsl

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scenarios mirrored from the reference's mapping-script fixtures
  * (the groovy scripts under `src/test/resources` driven by
  * `DslRecordMapperTest.java`):
  * flat mapping, literals, when-conditionals, nested section/exit, stop,
  * sequential overwrite, absent-value defaulting, wrong-type rejection. */
class MappingDslSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("out1", StringType),
    StructField("out2", StringType),
    StructField("n", IntegerType),
    StructField("flag", BooleanType)))

  private def df = Seq(
    ("pageView", "alpha", 1),
    ("custom", "beta", 2),
    (null, "gamma", 3)).toDF("etype", "name", "id")

  test("flat mapping + literals (flat-mapping.groovy)") {
    val m = MappingDsl.mapping(schema) { b =>
      b.map(col("name")) onto "out1"
      b.map("fixed") onto "out2"
      b.map(7) onto "n"
    }
    val rows = m(df).collect()
    assert(rows.map(_.getAs[String]("out1")).toSeq === Seq("alpha", "beta", "gamma"))
    assert(rows.forall(_.getAs[String]("out2") == "fixed"))
    assert(rows.forall(_.getAs[Int]("n") == 7))
  }

  test("when applies only on true; absent cond means false (when-mapping.groovy)") {
    val m = MappingDsl.mapping(schema) { b =>
      b.map("before") onto "out1"
      // etype null for row 3 -> absent -> block skipped
      b.when(col("etype") === "pageView") { w =>
        w.map("pv") onto "out1"
        w.map(true) onto "flag"
      }
    }
    val rows = m(df).collect()
    assert(rows.map(_.getAs[String]("out1")).toSeq === Seq("pv", "before", "before"))
    assert(rows.map(r => Option(r.getAs[java.lang.Boolean]("flag"))).toSeq ===
      Seq(Some(true), None, None))
  }

  test("sequential overwrite: last fired assignment wins") {
    val m = MappingDsl.mapping(schema) { b =>
      b.map("first") onto "out1"
      b.map("second") onto "out1"
      b.when(col("id") === 2) { w => w.map("third") onto "out1" }
    }
    assert(m(df).collect().map(_.getAs[String]("out1")).toSeq ===
      Seq("second", "third", "second"))
  }

  test("absent mapped value keeps previous assignment (tryParse semantics)") {
    val m = MappingDsl.mapping(schema) { b =>
      b.map("fallback") onto "out1"
      b.map(when(col("id") === 2, "present")) onto "out1" // null except id=2
    }
    assert(m(df).collect().map(_.getAs[String]("out1")).toSeq ===
      Seq("fallback", "present", "fallback"))
  }

  test("section + exit aborts rest of section only (nested-conditional-exit.groovy)") {
    val m = MappingDsl.mapping(schema) { b =>
      b.section { s =>
        s.map("in-section") onto "out1"
        s.when(col("etype") === "pageView") { w => w.exit() }
        s.map("after-exit") onto "out1"
      }
      b.map("after-section") onto "out2"
    }
    val rows = m(df).collect()
    // pageView row: exit fired -> out1 stays "in-section"; others overwritten
    assert(rows.map(_.getAs[String]("out1")).toSeq ===
      Seq("in-section", "after-exit", "after-exit"))
    assert(rows.forall(_.getAs[String]("out2") == "after-section"))
  }

  test("stop aborts the whole mapping (stop semantics)") {
    val m = MappingDsl.mapping(schema) { b =>
      b.map("head") onto "out1"
      b.when(col("id") === 1) { w => w.stop() }
      b.map("tail") onto "out1"
      b.map("tail2") onto "out2"
    }
    val rows = m(df).collect()
    assert(rows.map(_.getAs[String]("out1")).toSeq === Seq("head", "tail", "tail"))
    assert(rows.map(_.getAs[String]("out2")).toSeq === Seq(null, "tail2", "tail2"))
  }

  test("exit at top level behaves like stop (DslRecordMapping.java:191-200)") {
    val m = MappingDsl.mapping(schema) { b =>
      b.map("head") onto "out1"
      b.exitWhen(col("id") === 3)
      b.map("tail") onto "out2"
    }
    val rows = m(df).collect()
    assert(rows.map(_.getAs[String]("out2")).toSeq === Seq("tail", "tail", null))
  }

  test("unknown target field fails at build time") {
    val e = intercept[IllegalArgumentException] {
      MappingDsl.mapping(schema) { b => b.map("x") onto "nope" }
    }
    assert(e.getMessage.contains("nope"))
  }

  test("avro schema defaults are honored for unmapped/absent fields") {
    val avsc =
      """{"type":"record","name":"T","fields":[
        |  {"name":"s","type":"string","default":"dflt"},
        |  {"name":"i","type":"int","default":-1},
        |  {"name":"opt","type":["null","string"],"default":null}
        |]}""".stripMargin
    val m = MappingDsl.mappingForAvro(avsc) { b =>
      b.when(col("id") === 2) { w => w.map(col("name")) onto "s" }
    }
    val rows = m(df).collect()
    assert(rows.map(_.getAs[String]("s")).toSeq === Seq("dflt", "beta", "dflt"))
    assert(rows.forall(_.getAs[Int]("i") == -1))
    assert(rows.forall(_.getAs[String]("opt") == null))
  }

  test("widening casts apply; mapping compiles to a single narrow select") {
    val m = MappingDsl.mapping(StructType(Seq(StructField("l", LongType)))) { b =>
      b.map(col("id")) onto "l" // int -> long widening
    }
    val out = m(df)
    assert(out.schema("l").dataType === LongType)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
