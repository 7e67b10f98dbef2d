package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions.parseUri
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Parse-once URI struct vs the reference's java.net.URI component
  * semantics (`UriValueProducer`, `DslRecordMapping.java:449-530`). */
class UrisSpec extends SparkSpec {
  import spark.implicits._

  private def parse(url: String): Row =
    Seq(url).toDF("u").select(parseUri(col("u")).as("p")).head().getStruct(0)

  test("full URL: every component populated") {
    val p = parse("https://shop.example:8443/cat/a%20b/item?x=1&x=2#frag%20y")
    assert(p.getAs[String]("scheme") === "https")
    assert(p.getAs[String]("host") === "shop.example")
    assert(p.getAs[Int]("port") === 8443)
    assert(p.getAs[String]("path") === "/cat/a b/item")     // decoded
    assert(p.getAs[String]("rawPath") === "/cat/a%20b/item") // raw
    assert(p.getAs[String]("rawQuery") === "x=1&x=2")
    assert(p.getAs[String]("fragment") === "frag y")
    assert(p.getAs[String]("rawFragment") === "frag%20y")
  }

  test("absent components are null, not empty or -1") {
    val p = parse("http://host/path")
    assert(p.isNullAt(p.fieldIndex("port")))     // undefined port
    assert(p.isNullAt(p.fieldIndex("query")))
    assert(p.isNullAt(p.fieldIndex("fragment")))
    val m = parse("mailto:someone@example.com")  // opaque URI: no host/path
    assert(m.getAs[String]("scheme") === "mailto")
    assert(m.isNullAt(m.fieldIndex("host")))
  }

  test("malformed and null input produce all-null fields (absent semantics)") {
    val bad = parse("ht tp://bro ken")
    assert((0 until bad.length).forall(bad.isNullAt))
    val n = Seq[Option[String]](None).toDF("u")
      .select(parseUri(col("u")).as("p")).head().getStruct(0)
    assert((0 until n.length).forall(n.isNullAt))
  }

  test("agrees with parse_url on the components both expose") {
    val urls = Seq(
      "https://shop.example:8443/cat/7/item?color=red&color=blue&size=2#frag7",
      "http://example.com/",
      "ftp://files.example:21/pub/file.txt")
    val df = urls.toDF("u").select(
      col("u"),
      parseUri(col("u")).as("p"),
      parse_url(col("u"), lit("PROTOCOL")).as("e_scheme"),
      parse_url(col("u"), lit("HOST")).as("e_host"),
      parse_url(col("u"), lit("PATH")).as("e_path"),
      parse_url(col("u"), lit("QUERY")).as("e_query"),
      parse_url(col("u"), lit("REF")).as("e_ref"))
    df.collect().foreach { r =>
      val p = r.getStruct(1)
      assert(p.getAs[String]("scheme") === r.getAs[String]("e_scheme"), r)
      assert(p.getAs[String]("host") === r.getAs[String]("e_host"), r)
      assert(p.getAs[String]("rawPath") === r.getAs[String]("e_path"), r)
      assert(p.getAs[String]("rawQuery") === r.getAs[String]("e_query"), r)
      assert(p.getAs[String]("rawFragment") === r.getAs[String]("e_ref"), r)
    }
  }
}
