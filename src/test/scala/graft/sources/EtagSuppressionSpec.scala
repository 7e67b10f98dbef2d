package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFC 7232 §3.2 matching semantics as the reference's endpoint applies
  * them (`ClientSideCookieEventHandler.java:100-137`, weak comparison
  * allowed): the sentinel in any list position, weak or strong, and `*`
  * suppress; anything else — including no header at all — logs. */
class EtagSuppressionSpec extends SparkSpec {
  import spark.implicits._

  private val S = EtagSuppression.SentinelEtag

  private def check(header: String): Boolean =
    Seq(Option(header)).toDF("h")
      .select(EtagSuppression.suppressed(col("h")))
      .head().getBoolean(0)

  test("strong and weak sentinel forms suppress; foreign tags do not") {
    assert(check(S))
    assert(check("W/" + S))
    assert(!check("\"deadbeef\""))
    assert(!check("W/\"deadbeef\""))
  }

  test("comma lists match any position, with arbitrary whitespace") {
    assert(check("\"a\", \"b\", " + S))
    assert(check(S + ",\"z\""))
    assert(check("  W/" + S + "  ,\"x\""))
    assert(!check("\"a\", \"b\", \"c\""))
  }

  test("* matches any representation; absent header logs") {
    assert(check("*"))
    assert(!check(null))
    assert(!check(""))
  }

  test("response surface carries the sentinel and anti-cache directives") {
    val h = EtagSuppression.ResponseHeaders
    assert(h("ETag") === "\"" + EtagSuppression.SentinelTag + "\"")
    assert(h("Content-Type") === "image/gif")
    assert(h("Cache-Control").contains("no-cache"))
  }

  test("annotate splits a request log into logged events and 304s") {
    val reqs = Seq(
      (1L, S),                       // duplicate re-issue
      (2L, "\"deadbeef\""),          // revalidation of something else
      (3L, null.asInstanceOf[String]) // fresh request
    ).toDF("event_id", "inm")
    val out = EtagSuppression.annotate(reqs, "inm")
      .select("event_id", "etag_suppressed", "http_status")
      .as[(Long, Boolean, Int)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, true, 304), (2L, false, 200), (3L, false, 200)))
    // the logged stream is the non-suppressed filter
    val logged = EtagSuppression.annotate(reqs, "inm")
      .filter(!col("etag_suppressed")).select("event_id")
      .as[Long].collect().sorted
    assert(logged.toSeq === Seq(2L, 3L))
  }
}
