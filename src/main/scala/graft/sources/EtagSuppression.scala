package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ETag duplicate-request suppression — the transport-level dedup of the
  * reference's browser endpoint (`ClientSideCookieEventHandler.java:58-59,
  * 100-137`): every pixel response carries a FIXED sentinel ETag, so a
  * browser that re-issues an already-answered event request (a GET it is
  * free to replay — back button, tab restore, cache revalidation) presents
  * that sentinel in `If-None-Match`; the server answers `304 Not Modified`
  * and does NOT log the event.
  *
  * Spark-native re-expression: the decision is a pure per-request column
  * over the request-log frame — built-in string functions only, so it
  * stays inside whole-stage codegen and needs no exchange; the 304s are a
  * `filter`, not a stateful dedup (the probabilistic cross-request dedup
  * remains `DuplicateMemory`'s job, exactly as in the reference where both
  * layers coexist).
  *
  * Matching follows RFC 7232 §3.2 as the reference's
  * `ETagUtils.handleIfNoneMatch(..., allowWeak = true)` applies it: the
  * header is a comma-separated list of entity-tags or `*`; weak tags
  * (`W/"..."`) compare by opaque value under weak comparison; `*` matches
  * any current representation. */
object EtagSuppression {

  /** The sentinel tag the reference stamps on every response
    * (`ClientSideCookieEventHandler.java:58`). Any value works as long as
    * responses and the suppression check agree; keeping the reference's
    * constant makes mixed fleets interoperable. */
  val SentinelTag = "6b3edc43-20ec-4078-bc47-e965dd76b88a"
  /** Strong-form wire representation (the `ETag` response header value). */
  val SentinelEtag: String = "\"" + SentinelTag + "\""

  /** The fixed response headers of the pixel endpoint
    * (`ClientSideCookieEventHandler.java:112-117`): anti-cache directives
    * plus the sentinel ETag that arms the suppression. */
  val ResponseHeaders: Map[String, String] = Map(
    "Content-Type" -> "image/gif",
    "ETag" -> SentinelEtag,
    "Cache-Control" -> "private, no-cache, proxy-revalidate",
    "Pragma" -> "no-cache",
    "Expires" -> "Fri, 14 Apr 1995 11:30:00 GMT")

  /** TRUE when a request carrying this `If-None-Match` header value is a
    * duplicate re-issue and must be answered 304 without logging. Null /
    * absent header → false (a fresh request). */
  def suppressed(ifNoneMatch: Column): Column = {
    // each list entry: strip optional weak prefix, then surrounding quotes
    val values = transform(split(ifNoneMatch, ","),
      t => regexp_replace(regexp_replace(trim(t), "^W/", ""), "^\"|\"$", ""))
    coalesce(
      exists(values, v => v === lit(SentinelTag) || v === lit("*")),
      lit(false))
  }

  /** HTTP status the endpoint answers: 304 for suppressed duplicates, 200
    * (with the transparent pixel) otherwise. */
  def status(ifNoneMatch: Column): Column =
    when(suppressed(ifNoneMatch), lit(304)).otherwise(lit(200))

  /** Annotate a request frame: `etag_suppressed` + `http_status`. The
    * logged-event stream is `.filter(!col("etag_suppressed"))`. */
  def annotate(df: DataFrame, ifNoneMatchCol: String): DataFrame = df
    .withColumn("etag_suppressed", suppressed(col(ifNoneMatchCol)))
    .withColumn("http_status", status(col(ifNoneMatchCol)))
}
