package graft.queries

import graft.Tables._
import graft.sources.{BrowserSource, JsonSource}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable end-to-end exercises of the source decoders: each query
  * derives a wire-format payload from the `events` table deterministically,
  * pushes it through the full decode path (query-string parse, base36,
  * mincode, flags, ISO timestamps), and emits plain columns whose expected
  * values the DuckDB oracle computes directly from the source table. Any
  * decoder defect breaks the hash match.
  *
  * Scale: encode+decode is a single narrow projection stage per row — the
  * plan has no exchange; throughput scales with input splits.
  */
object SourceQueries {

  /** events projected to the columns the wire payloads are derived from. */
  private def base(spark: SparkSession, d: String): DataFrame =
    events(spark, d).select(
      col("event_id"),
      unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
      col("user_id"), col("event_type"), col("value"), col("props"))

  // --------------------------------------------------------------- browser
  /** GET-pixel roundtrip: base36 timestamps, t/f flags, url-encoded
    * location, mincode event parameters; no `x` param, so `corrupt` must
    * come back uniformly true (absent checksum ⇒ corrupt,
    * `ClientSideCookieEventHandler.java:206-239`). */
  def browserRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val b36ts = lower(conv(col("ts_ms").cast("string"), 10, 36))
    val qs = concat_ws("&",
      concat(lit("p=0%3A"), b36ts, lit("%3Auser"), col("user_id")),
      concat(lit("e="), col("event_id").cast("string")),
      concat(lit("c="), b36ts),
      concat(lit("t="), col("event_type")),
      concat(lit("n="), when(col("user_id") % 2 === 0, "t").otherwise("f")),
      concat(lit("l=http%3A%2F%2Fexample.com%2Fu%2F"), col("user_id")),
      concat(lit("w="),
        lower(conv(floor(col("value") * 100).cast("long").cast("string"), 10, 36))),
      concat(lit("u=(dk!"),
        lower(conv(get_json_object(col("props"), "$.k").cast("long").cast("string"), 10, 36)),
        lit("!)")))
    val decoded = BrowserSource.decode(
      base(spark, d).withColumn("qs", qs), "qs")
    decoded.select(
      col("eventId").cast("long").as("event_id"),
      col("eventType").as("event_type"),
      col("clientTime").as("client_ms"),
      col("partyIdTime").as("party_ms"),
      col("newPartyId").as("new_party"),
      col("browser.location").as("location"),
      get_json_object(col("eventParameters"), "$.k").cast("long").as("param_k"),
      col("browser.viewportPixelWidth").as("viewport_w"),
      col("corrupt"))
  }

  val browserRoundtripSql: String =
    """SELECT event_id, event_type,
      |  epoch_ms(ts) AS client_ms,
      |  epoch_ms(ts) AS party_ms,
      |  user_id % 2 = 0 AS new_party,
      |  'http://example.com/u/' || CAST(user_id AS VARCHAR) AS location,
      |  CAST(json_extract_string(props, 'k') AS BIGINT) AS param_k,
      |  CAST(FLOOR(value * 100) AS INT) AS viewport_w,
      |  TRUE AS corrupt
      |FROM events""".stripMargin

  // --------------------------------------------------------------- json
  /** JSON-container roundtrip: ISO-8601 client timestamp parse and the
    * raw-parameters passthrough (`JsonEventHandler.java:128-158`). */
  def jsonRoundtrip(spark: SparkSession, d: String): DataFrame = {
    val iso = date_format(col("ts").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    val body = concat(
      lit("""{"event_type":""""), col("event_type"),
      lit("""","session_id":"0:sid","event_id":""""), col("event_id"),
      lit("""","is_new_party":"""), (col("user_id") % 3 === 0).cast("string"),
      lit(""","is_new_session":"""), (col("user_id") % 5 === 0).cast("string"),
      lit(""","client_timestamp_iso":""""), iso,
      lit("""","parameters":"""), col("props"), lit("}"))
    val decoded = JsonSource.decode(
      events(spark, d).withColumn("body", body)
        .withColumn("pid", concat(lit("0:1:party"), col("user_id"))),
      "body", "pid")
    decoded.select(
      col("eventId").cast("long").as("event_id"),
      col("eventType").as("event_type"),
      col("clientTime").as("client_ms"),
      col("newPartyId").as("new_party"),
      col("firstInSession").as("first_in_session"),
      get_json_object(col("eventParameters"), "$.k").cast("long").as("param_k"),
      col("partyId").as("party_id"),
      col("corrupt"))
  }

  val jsonRoundtripSql: String =
    """SELECT event_id, event_type,
      |  epoch_ms(ts) AS client_ms,
      |  user_id % 3 = 0 AS new_party,
      |  user_id % 5 = 0 AS first_in_session,
      |  CAST(json_extract_string(props, 'k') AS BIGINT) AS param_k,
      |  '0:1:party' || CAST(user_id AS VARCHAR) AS party_id,
      |  FALSE AS corrupt
      |FROM events""".stripMargin

  // --------------------------------------------------------------- uri
  /** The URI producer family (`UriValueProducer`,
    * `DslRecordMapping.java:449-530`): synthesize a URL per event, parse it
    * ONCE into the component struct ([[graft.functions.Uris]] — the
    * reference memoizes parseUri the same way), emit every component the
    * reference's producers expose (+ the multi-value query map for
    * `.query()` semantics). */
  def uriParse(spark: SparkSession, d: String): DataFrame = {
    val url = concat(
      lit("https://shop.example:8443/cat/"), col("user_id"),
      lit("/item?color=red&color=blue&size="), col("user_id") % 5,
      lit("#frag"), col("user_id"))
    events(spark, d).select(col("event_id"), col("user_id"))
      .withColumn("url", url)
      .withColumn("u", graft.functions.GraftFunctions.parseUri(col("url")))
      .select(
        col("event_id"),
        col("u.scheme").as("scheme"),
        col("u.host").as("host"),
        col("u.port").as("port"),
        col("u.rawPath").as("path"),
        col("u.rawQuery").as("query_string"),
        col("u.rawFragment").as("fragment"),
        element_at(element_at(
          graft.functions.GraftFunctions.parseQueryString(col("u.rawQuery")),
          "size"), 1).as("size_value"),
        // .query().valueList('color') — multi-value map semantics
        array_join(element_at(
          graft.functions.GraftFunctions.parseQueryString(col("u.rawQuery")),
          "color"), ",").as("color_values"))
  }

  val uriParseSql: String =
    """SELECT event_id,
      |  'https' AS scheme,
      |  'shop.example' AS host,
      |  8443 AS port,
      |  '/cat/' || CAST(user_id AS VARCHAR) || '/item' AS path,
      |  'color=red&color=blue&size=' || CAST(user_id % 5 AS VARCHAR) AS query_string,
      |  'frag' || CAST(user_id AS VARCHAR) AS fragment,
      |  CAST(user_id % 5 AS VARCHAR) AS size_value,
      |  'red,blue' AS color_values
      |FROM events""".stripMargin

  /** ETag duplicate-request suppression over a synthetic request log
    * ([[graft.sources.EtagSuppression]]; reference
    * `ClientSideCookieEventHandler.java:100-137`): five deterministic
    * `If-None-Match` shapes — strong sentinel, weak sentinel, sentinel
    * inside a list, a foreign tag, and no header — annotated with the
    * suppression flag and HTTP status. Narrow codegen'd pass, zero
    * exchanges; the oracle pins the analytically-known outcome per shape
    * (the RFC 7232 parse itself is exercised edge-by-edge in
    * EtagSuppressionSpec). */
  def etagSuppress(spark: SparkSession, d: String): DataFrame = {
    import graft.sources.EtagSuppression
    val hdr = element_at(array(
      lit(EtagSuppression.SentinelEtag),
      lit("W/" + EtagSuppression.SentinelEtag),
      lit("\"deadbeef\" , " + EtagSuppression.SentinelEtag),
      lit("\"deadbeef\""),
      lit(null).cast("string")),
      (col("event_id") % 5 + 1).cast("int"))
    EtagSuppression.annotate(
      events(spark, d).select(col("event_id")).withColumn("if_none_match", hdr),
      "if_none_match")
  }

  val etagSuppressSql: String =
    """SELECT event_id,
      |  CASE event_id % 5
      |    WHEN 0 THEN '"6b3edc43-20ec-4078-bc47-e965dd76b88a"'
      |    WHEN 1 THEN 'W/"6b3edc43-20ec-4078-bc47-e965dd76b88a"'
      |    WHEN 2 THEN '"deadbeef" , "6b3edc43-20ec-4078-bc47-e965dd76b88a"'
      |    WHEN 3 THEN '"deadbeef"'
      |  END AS if_none_match,
      |  event_id % 5 <= 2 AS etag_suppressed,
      |  CASE WHEN event_id % 5 <= 2 THEN 304 ELSE 200 END AS http_status
      |FROM events""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_browser_roundtrip" -> (browserRoundtrip _),
    "src_json_roundtrip"    -> (jsonRoundtrip _),
    "src_etag_suppress"     -> (etagSuppress _),
    "uri_parse"             -> (uriParse _))

  val oracles: Map[String, String] = Map(
    "src_browser_roundtrip" -> browserRoundtripSql,
    "src_json_roundtrip"    -> jsonRoundtripSql,
    "src_etag_suppress"     -> etagSuppressSql,
    "uri_parse"             -> uriParseSql)
}
