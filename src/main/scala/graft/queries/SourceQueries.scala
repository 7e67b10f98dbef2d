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

  /** X-Forwarded-For peer resolution through the REAL source path
    * ([[graft.sources.PeerAddress]] inside BrowserSource.decode; reference
    * `ProxyAdjacentPeerAddressHandler.java:40-59` wired at
    * `Server.java:135-138`): seven deterministic header shapes — absent,
    * single IP, multi-hop (rightmost wins), hostname (not resolved: no
    * per-row DNS, address kept), bracketed IPv6 (normalized to Java's
    * uncompressed form), IP:port (getByName-unparseable, address kept),
    * and v4-mapped IPv6 (collapses to the IPv4 literal). Scheme comes from
    * X-Forwarded-Proto (first value). Narrow codegen'd pass, zero
    * exchanges; the oracle pins the expected address per shape. */
  def xffResolve(spark: SparkSession, d: String): DataFrame = {
    val f = base(spark, d).select(col("event_id"), col("user_id"))
      .withColumn("remoteHost",
        concat(lit("10.0."), (col("user_id") % 256).cast("string"), lit(".1")))
      .withColumn("xForwardedFor", element_at(array(
        lit(null).cast("string"),
        lit("203.0.113.7"),
        lit("10.0.0.1, 203.0.113.9"),
        lit("evil.example.com"),
        lit("10.0.0.1,[2001:db8::2]"),
        lit("203.0.113.9:8080"),
        lit("::ffff:203.0.113.77")), (col("event_id") % 7 + 1).cast("int")))
      .withColumn("xForwardedProto",
        when(col("event_id") % 2 === 0, "https").otherwise("http, https"))
      .withColumn("scheme", lit("http"))
      .withColumn("qs", concat(lit("e="), col("event_id").cast("string")))
    BrowserSource.decode(f, "qs").select(
      col("event_id"),
      col("xForwardedFor").as("xff"),
      col("remoteHost").as("remote_host"),
      col("scheme"))
  }

  val xffResolveSql: String =
    """SELECT event_id,
      |  CASE event_id % 7
      |    WHEN 1 THEN '203.0.113.7'
      |    WHEN 2 THEN '10.0.0.1, 203.0.113.9'
      |    WHEN 3 THEN 'evil.example.com'
      |    WHEN 4 THEN '10.0.0.1,[2001:db8::2]'
      |    WHEN 5 THEN '203.0.113.9:8080'
      |    WHEN 6 THEN '::ffff:203.0.113.77'
      |  END AS xff,
      |  CASE event_id % 7
      |    WHEN 1 THEN '203.0.113.7'
      |    WHEN 2 THEN '203.0.113.9'
      |    WHEN 4 THEN '2001:db8:0:0:0:0:0:2'
      |    WHEN 6 THEN '203.0.113.77'
      |    ELSE '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.1'
      |  END AS remote_host,
      |  CASE WHEN event_id % 2 = 0 THEN 'https' ELSE 'http' END AS scheme
      |FROM events""".stripMargin

  /** JSON body-size limit through the real decode path
    * ([[graft.sources.JsonSource]]; reference
    * `AsyncRequestBodyReceiver.java:100-104` rejects with 413 before
    * parsing, cutoff = `maximum_body_size` rounded up to the 4096-byte
    * chunk): four deterministic body shapes around the boundary — well
    * under, exactly 4096 bytes (accepted), 4097 bytes (rejected), and a
    * multi-byte UTF-8 body whose CHAR count is under the limit but whose
    * BYTE count is over (proves the check is on octets). Oversized rows
    * come back flagged with every decoded field null — the flag-not-drop
    * analog of the event the reference never emits. */
  def jsonOversize(spark: SparkSession, d: String): DataFrame = {
    val eid = col("event_id").cast("string")
    val pre = concat(
      lit("{\"session_id\":\"sess-"), eid,
      lit("\",\"event_id\":\"ev-"), eid,
      lit("\",\"is_new_party\":"),
      when(col("event_id") % 2 === 0, "true").otherwise("false"),
      lit(",\"is_new_session\":false,\"client_timestamp_iso\":" +
        "\"2023-05-06T07:08:09.123Z\",\"parameters\":{\"pad\":\""))
    val suf = lit("\"}}")
    val target = element_at(
      array(lit(2048), lit(4096), lit(4097), lit(0)),
      (col("event_id") % 4 + 1).cast("int"))
    val pad = when(col("event_id") % 4 === 3, repeat(lit("é"), 2100))
      .otherwise(repeat(lit("x"),
        (target - octet_length(pre) - octet_length(suf)).cast("int")))
    val fixture = base(spark, d).select(col("event_id"))
      .withColumn("body", concat(pre, pad, suf))
      .withColumn("pid", concat(lit("party-"), eid))
    val decoded = JsonSource.decode(fixture, "body", "pid")
    decoded.select(
      col("event_id"),
      octet_length(col("body")).cast("long").as("body_bytes"),
      col("bodyOversized").as("oversized"),
      col("partyId").as("party_id"),
      col("sessionId").as("session_id"),
      col("newPartyId").as("new_party"),
      col("clientTime").as("client_ms"),
      length(get_json_object(col("eventParameters"), "$.pad"))
        .cast("long").as("pad_chars"))
  }

  val jsonOversizeSql: String =
    """WITH f AS (
      |  SELECT event_id,
      |    '{"session_id":"sess-' || event_id || '","event_id":"ev-' || event_id ||
      |    '","is_new_party":' || CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END ||
      |    ',"is_new_session":false,"client_timestamp_iso":"2023-05-06T07:08:09.123Z","parameters":{"pad":"' AS pre,
      |    '"}}' AS suf,
      |    CASE event_id % 4 WHEN 0 THEN 2048 WHEN 1 THEN 4096 WHEN 2 THEN 4097 ELSE 0 END AS target
      |  FROM events),
      | b AS (
      |  SELECT event_id, target, pre, suf,
      |    pre || CASE WHEN event_id % 4 = 3 THEN repeat('é', 2100)
      |                ELSE repeat('x', target - strlen(pre) - strlen(suf)) END || suf AS body
      |  FROM f)
      |SELECT event_id,
      |  CAST(strlen(body) AS BIGINT) AS body_bytes,
      |  strlen(body) > 4096 AS oversized,
      |  CASE WHEN strlen(body) <= 4096 THEN 'party-' || event_id END AS party_id,
      |  CASE WHEN strlen(body) <= 4096 THEN 'sess-' || event_id END AS session_id,
      |  CASE WHEN strlen(body) <= 4096 THEN event_id % 2 = 0 END AS new_party,
      |  CASE WHEN strlen(body) <= 4096 THEN 1683356889123 END AS client_ms,
      |  CASE WHEN strlen(body) <= 4096
      |       THEN CAST(target - strlen(pre) - strlen(suf) AS BIGINT) END AS pad_chars
      |FROM b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_browser_roundtrip" -> (browserRoundtrip _),
    "src_json_roundtrip"    -> (jsonRoundtrip _),
    "src_etag_suppress"     -> (etagSuppress _),
    "src_xff_resolve"       -> (xffResolve _),
    "src_json_oversize"     -> (jsonOversize _),
    "uri_parse"             -> (uriParse _))

  val oracles: Map[String, String] = Map(
    "src_browser_roundtrip" -> browserRoundtripSql,
    "src_json_roundtrip"    -> jsonRoundtripSql,
    "src_etag_suppress"     -> etagSuppressSql,
    "src_xff_resolve"       -> xffResolveSql,
    "src_json_oversize"     -> jsonOversizeSql,
    "uri_parse"             -> uriParseSql)
}
