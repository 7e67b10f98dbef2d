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

  // ---- user-agent classification through a LOADED rule database --------

  /** Synthetic rule file in the public uap-core `regexes.yaml` format
    * (authored here, not copied): exercises family_replacement renaming,
    * default-group families, `$n` version templates, the case-insensitive
    * `regex_flag`, an os_parser override, and the "Spider" device marker. */
  private val uaDbYaml =
    """# synthetic uap-core-format rules (test fixture)
      |user_agent_parsers:
      |  - regex: 'Edg/(\d+)\.(\d+)'
      |    family_replacement: 'Microsoft Edge'
      |    v1_replacement: '$1'
      |    v2_replacement: '$2'
      |  - regex: '(Chrome)/(\d+)\.(\d+)\.(\d+)'
      |  - regex: '(Firefox)/(\d+)\.(\d+)'
      |  - regex: '(ZetaSurf)/(\d+)\.(\d+)\.(\d+)'
      |  - regex: 'Googlebot/(\d+)\.(\d+)'
      |    family_replacement: 'Googlebot'
      |    v1_replacement: '$1'
      |    v2_replacement: '$2'
      |os_parsers:
      |  - regex: 'Windows NT 10\.0'
      |    os_replacement: 'Windows'
      |    os_v1_replacement: '10'
      |device_parsers:
      |  - regex: 'googlebot'
      |    regex_flag: 'i'
      |    device_replacement: 'Spider'
      |    brand_replacement: 'Spider'
      |""".stripMargin

  /** Writes the fixture database once (atomic tmp+rename, content-hashed
    * name) and returns its path — the shape of a user dropping the
    * published regexes.yaml onto shared storage. */
  private def uaDbPath(): String = {
    val f = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-ua-${Integer.toHexString(uaDbYaml.hashCode)}.yaml")
    if (!f.exists()) {
      val tmp = java.io.File.createTempFile("graft-ua", ".yaml", f.getParentFile)
      java.nio.file.Files.writeString(tmp.toPath, uaDbYaml)
      tmp.renameTo(f)
    }
    f.getAbsolutePath
  }

  // Six public/representative UA strings selected per-row by user_id%6;
  // the pool covers: database agreeing with the built-ins (0,1), a
  // database-only family the heuristics can't name (2), a bot flagged by
  // the Spider device rule (3), the database RENAMING a built-in family —
  // proving first-match precedence (4), and a database miss falling back
  // to the built-ins untouched (5).
  private val dbUas = Seq(
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0",
    "Mozilla/5.0 (X11; Linux x86_64) ZetaSurf/3.2.1",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Safari/605.1.15")

  /** UA enrichment driven through a loaded uap-core database
    * ([[graft.functions.UaDatabase]]) with built-in fallback — the
    * reference's pluggable uadetector-database slot
    * (`UserAgentParserAndCache.java:40-88`) re-expressed as a rule file on
    * shared storage named by a plan-time path. Narrow per-row stage, no
    * exchange; the database loads once per executor JVM and classification
    * stays behind the per-thread LRU. */
  def uaDbEnrich(spark: SparkSession, d: String): DataFrame = {
    val path = uaDbPath()
    val uaCol = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.UaParse(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("ua")),
        Some(path)))
    events(spark, d)
      .withColumn("ua", element_at(
        array(dbUas.map(lit): _*), (col("user_id") % 6 + 1).cast("int")))
      .withColumn("u", uaCol)
      .select(
        col("event_id"),
        col("u.name").as("ua_name"),
        col("u.version").as("ua_version"),
        col("u.deviceCategory").as("ua_device"),
        col("u.osFamily").as("ua_os"),
        col("u.osVersion").as("ua_os_version"),
        col("u.uaType").as("ua_type"))
  }

  // Expectations, row by row of the pool: 0 Chrome via the db (db version
  // "120.0.0" — three template groups — and db os version "10" differ from
  // the built-ins' "120.0.0.0"/"10.0", proving the db path took effect);
  // 1 Firefox via default-group family; 2 ZetaSurf (db-only family);
  // 3 Googlebot (Spider device rule → Robot/Other); 4 renamed to
  // "Microsoft Edge" (db precedence over the built-in "Edge");
  // 5 Safari (db miss → built-in fallback, untouched versions).
  val uaDbEnrichSql: String =
    """SELECT event_id,
      |  CASE user_id % 6 WHEN 0 THEN 'Chrome' WHEN 1 THEN 'Firefox'
      |    WHEN 2 THEN 'ZetaSurf' WHEN 3 THEN 'Googlebot'
      |    WHEN 4 THEN 'Microsoft Edge' ELSE 'Safari' END AS ua_name,
      |  CASE user_id % 6 WHEN 0 THEN '120.0.0' WHEN 1 THEN '119.0'
      |    WHEN 2 THEN '3.2.1' WHEN 3 THEN '2.1'
      |    WHEN 4 THEN '120.0' ELSE '17.2' END AS ua_version,
      |  CASE user_id % 6 WHEN 3 THEN 'Other'
      |    ELSE 'Personal computer' END AS ua_device,
      |  CASE user_id % 6 WHEN 0 THEN 'Windows' WHEN 1 THEN 'Linux'
      |    WHEN 2 THEN 'Linux' WHEN 3 THEN NULL
      |    WHEN 4 THEN 'Windows' ELSE 'OS X' END AS ua_os,
      |  CASE user_id % 6 WHEN 0 THEN '10' WHEN 4 THEN '10'
      |    WHEN 5 THEN '10.15.7' ELSE NULL END AS ua_os_version,
      |  CASE user_id % 6 WHEN 3 THEN 'Robot' ELSE 'Browser' END AS ua_type
      |FROM events""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsl_default_mapping" -> (defaultMapping _),
    "dsl_digest"          -> (digestFields _),
    "dsl_ua_db_enrich"        -> (uaDbEnrich _))

  val oracles: Map[String, String] = Map(
    "dsl_default_mapping" -> defaultMappingSql,
    "dsl_digest"          -> digestFieldsSql,
    "dsl_ua_db_enrich"        -> uaDbEnrichSql)
}
