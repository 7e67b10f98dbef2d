package graft.functions

import graft.SparkSpec
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

class TransportSpec extends SparkSpec {
  import spark.implicits._

  test("x-forwarded-for: proxy-adjacent (last) entry wins") {
    val df = Seq("203.0.113.7, 198.51.100.2, 10.0.0.9", "192.0.2.1", "")
      .toDF("xff").select(xForwardedForClient(col("xff")).as("client"))
    assert(df.as[String].collect() === Array("10.0.0.9", "192.0.2.1", null))
  }

  test("cookie producer") {
    val df = Seq("_dvp=0:abc:xyz; theme=dark; a=1").toDF("cookie")
      .select(
        cookieValue(col("cookie"), "_dvp").as("dvp"),
        cookieValue(col("cookie"), "theme").as("theme"),
        cookieValue(col("cookie"), "missing").as("m"))
    val r = df.collect()(0)
    assert(r.getString(0) === "0:abc:xyz")
    assert(r.getString(1) === "dark")
    assert(r.isNullAt(2))
  }

  test("event parameter value/path over mincode-decoded JSON") {
    val json = Mincode.toJson("(sname!John!aitems!(dcount!2!jprice!9.5!)(dcount!3!jprice!1.5!).)")
    val df = Seq(json).toDF("params").select(
      eventParamValue(col("params"), "name").as("name"),
      eventParamPath(col("params"), "$.items[0].count").as("c0"),
      eventParamPath(col("params"), "$.items[1].price").as("p1"),
      eventParamPath(col("params"), "$.missing").as("m"))
    val r = df.collect()(0)
    assert(r.getString(0) === "John")
    assert(r.getString(1) === "2")
    assert(r.getString(2) === "1.5")
    assert(r.isNullAt(3))
  }

  test("cookieValue: duplicate cookie names take the FIRST, never throw") {
    import graft.functions.GraftFunctions.cookieValue
    // RFC 6265 allows the same name for different path/domain; str_to_map
    // would throw DUPLICATE_MAP_KEY under the default EXCEPTION policy
    val df = Seq("a=1; b=2; a=3").toDF("cookie")
      .select(cookieValue(col("cookie"), "a").as("a"),
        cookieValue(col("cookie"), "b").as("b"))
    assert(df.as[(String, String)].collect().toSeq === Seq(("1", "2")))
  }
}
