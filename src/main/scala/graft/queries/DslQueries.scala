package graft.queries

import graft.Tables._
import graft.dsl.DefaultMapping
import graft.sources.BrowserSource
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end exercise of the mapping layer: events → synthesized GET-pixel
  * wire request → BrowserSource decode → built-in default mapping
  * (`Mapping.java:70-100`) with user-agent enrichment — outputs checked
  * field-by-field by the DuckDB oracle.
  *
  * Scale: encode + decode + map is one narrow codegen stage plus a single
  * per-row UA UDF call; no exchange in the plan.
  */
object DslQueries {

  // Four public, representative UA strings, selected per-row by user_id%4;
  // the oracle recomputes the expected classification with a CASE.
  private val uas = Seq(
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0",
    "Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)")

  def defaultMapping(spark: SparkSession, d: String): DataFrame = {
    val ev = events(spark, d)
      .withColumn("ts_ms", unix_millis(col("ts").cast("timestamp")))
    val b36ts = lower(conv(col("ts_ms").cast("string"), 10, 36))
    val qs = concat_ws("&",
      concat(lit("p=0%3A"), b36ts, lit("%3Auser"), col("user_id")),
      concat(lit("s=0%3A"), b36ts, lit("%3Asess"), col("user_id")),
      concat(lit("v=pv"), col("event_id")),
      concat(lit("e=pv"), col("event_id"), lit("%3A0")),
      concat(lit("c="), b36ts),
      lit("n=f"),
      concat(lit("f="), when(col("event_type") === "signup", "t").otherwise("f")),
      concat(lit("l=http%3A%2F%2Fshop.example%2Fp%2F"), col("user_id")),
      concat(lit("r=http%3A%2F%2Fref.example%2F")),
      concat(lit("w="), lower(conv(floor(col("value")).cast("long").cast("string"), 10, 36))),
      concat(lit("t="), col("event_type")))
    val wire = ev
      .withColumn("qs", qs)
      .withColumn("userAgentString", element_at(
        array(uas.map(lit): _*), (col("user_id") % 4 + 1).cast("int")))
      .withColumn("remoteHost", concat(lit("10.0."), col("user_id") % 256, lit(".1")))
      .withColumn("requestTimestamp", col("ts_ms"))
      .withColumn("duplicate", lit(false))
    val mapped = DefaultMapping(BrowserSource.decode(wire, "qs"))
    mapped.select(
      col("partyId").as("party_id"),
      col("sessionId").as("session_id"),
      col("pageViewId").as("page_view_id"),
      col("eventType").as("event_type"),
      col("timestamp").as("ts_ms"),
      col("clientTimestamp").as("client_ms"),
      col("remoteHost").as("remote_host"),
      col("location"),
      col("referer"),
      col("viewportPixelWidth").as("viewport_w"),
      col("firstInSession").as("first_in_session"),
      col("detectedCorruption").as("corrupt"),
      col("detectedDuplicate").as("dup"),
      col("userAgentName").as("ua_name"),
      col("userAgentVersion").as("ua_version"),
      col("userAgentDeviceCategory").as("ua_device"),
      col("userAgentOsFamily").as("ua_os"),
      col("userAgentType").as("ua_type"))
  }

  val defaultMappingSql: String =
    """SELECT
      |  '0:' || lower(to_base(epoch_ms(ts), 36)) || ':user' || CAST(user_id AS VARCHAR) AS party_id,
      |  '0:' || lower(to_base(epoch_ms(ts), 36)) || ':sess' || CAST(user_id AS VARCHAR) AS session_id,
      |  'pv' || CAST(event_id AS VARCHAR) AS page_view_id,
      |  event_type,
      |  epoch_ms(ts) AS ts_ms,
      |  epoch_ms(ts) AS client_ms,
      |  '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.1' AS remote_host,
      |  'http://shop.example/p/' || CAST(user_id AS VARCHAR) AS location,
      |  'http://ref.example/' AS referer,
      |  CAST(FLOOR(value) AS INT) AS viewport_w,
      |  event_type = 'signup' AS first_in_session,
      |  TRUE AS corrupt,
      |  FALSE AS dup,
      |  CASE user_id % 4 WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Firefox'
      |                   WHEN 2 THEN 'Safari' ELSE 'Googlebot' END AS ua_name,
      |  CASE user_id % 4 WHEN 0 THEN '120.0.0.0' WHEN 1 THEN '119.0'
      |                   WHEN 2 THEN '16.6' ELSE '2.1' END AS ua_version,
      |  CASE user_id % 4 WHEN 0 THEN 'Personal computer' WHEN 1 THEN 'Personal computer'
      |                   WHEN 2 THEN 'Smartphone' ELSE 'Other' END AS ua_device,
      |  CASE user_id % 4 WHEN 0 THEN 'Windows' WHEN 1 THEN 'Linux'
      |                   WHEN 2 THEN 'iOS' ELSE NULL END AS ua_os,
      |  CASE user_id % 4 WHEN 3 THEN 'Robot' ELSE 'Browser' END AS ua_type
      |FROM events""".stripMargin

  /** The digest producer family (`Digester.java:44-78`; Groovy
    * `digest('SHA-256').add(...).result()`) as an oracle-checked query:
    * MD5 and SHA-256 over ordered pieces, with a piece that is absent for
    * some rows — absent pieces contribute NO bytes (the reference skips
    * them), which the oracle mirrors with COALESCE(x, ''). Runs through
    * the custom [[graft.functions.DigestPieces]] expression (the HMAC-
    * seeded variant has no DuckDB equivalent and is spec-checked in
    * DigestsSpec). Narrow per-row stage, no exchange. */
  def digestFields(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.digest
    val maybe = when(col("user_id") % 7 =!= 0, col("event_type")) // absent piece
    events(spark, d).select(
      col("event_id"),
      lower(hex(digest("MD5",
        col("event_type"), col("user_id").cast("string")))).as("md5_hex"),
      lower(hex(digest("SHA-256",
        maybe, col("user_id").cast("string")))).as("sha256_hex"))
  }

  val digestFieldsSql: String =
    """SELECT event_id,
      |  md5(event_type || CAST(user_id AS VARCHAR)) AS md5_hex,
      |  sha256(COALESCE(CASE WHEN user_id % 7 <> 0 THEN event_type END, '')
      |         || CAST(user_id AS VARCHAR)) AS sha256_hex
      |FROM events""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsl_default_mapping" -> (defaultMapping _),
    "dsl_digest"          -> (digestFields _))

  val oracles: Map[String, String] = Map(
    "dsl_default_mapping" -> defaultMappingSql,
    "dsl_digest"          -> digestFieldsSql)
}
