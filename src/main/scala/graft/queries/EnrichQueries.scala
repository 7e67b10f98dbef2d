package graft.queries

import graft.Tables._
import graft.functions.GeoIp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Enrichment + multimodal-column queries.
  *
  * geo_enrich drives the ip2geo broadcast range join with a dimension table
  * derived from `nation` (25 rows standing in for a MaxMind-style range db)
  * against per-event synthetic IPs; the oracle recomputes the join in SQL.
  *
  * media_* treat text bytes as an opaque BINARY media column with typed
  * metadata — the decode step is a clearly-marked deterministic STUB (no
  * image/audio libs in this container) while the Spark-side plumbing
  * (binary column, schema, per-partition batch shape, explode of sampled
  * frames) is real and oracle-checked.
  */
object EnrichQueries {

  // --------------------------------------------------------------- geo
  /** Per-nation IP range: nation k owns [BASE + k*2600, BASE + (k+1)*2600).
    * IPs land via user_id; ids mapping outside any range stay null. */
  private val IpBase = 10L * 16777216L // 10.0.0.0

  def geoEnrich(spark: SparkSession, d: String): DataFrame = {
    val dim = nation(spark, d).select(
      col("n_name"),
      (lit(IpBase) + col("n_nationkey") * 2600L).as("ip_start"),
      (lit(IpBase) + (col("n_nationkey") + 1) * 2600L - 1L).as("ip_end"))
    val ev = events(spark, d).select(
      col("event_id"),
      concat(lit("10.0."),
        (col("user_id") % 256).cast("string"), lit("."),
        ((col("user_id") * 7) % 256).cast("string")).as("ip"))
    GeoIp.enrichPrefix(ev, "ip", dim)
      .select(col("event_id"), col("ip"), col("n_name").as("geo_name"))
  }

  val geoEnrichSql: String =
    s"""WITH ev AS (SELECT event_id,
       |    '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' ||
       |      CAST((user_id * 7) % 256 AS VARCHAR) AS ip,
       |    $IpBase + (user_id % 256) * 256 + (user_id * 7) % 256 AS ip_num
       |  FROM events),
       | dim AS (SELECT n_name,
       |    $IpBase + n_nationkey * 2600 AS ip_start,
       |    $IpBase + (n_nationkey + 1) * 2600 - 1 AS ip_end
       |  FROM nation)
       |SELECT event_id, ip, n_name AS geo_name
       |FROM ev LEFT JOIN dim ON ip_num BETWEEN ip_start AND ip_end""".stripMargin

  // --------------------------------------------------------------- media
  /** The documents table as an opaque media-blob frame: BINARY payload +
    * typed metadata — the §multimodal column model. */
  private def media(spark: SparkSession, d: String): DataFrame =
    documents(spark, d).select(
      col("doc_id"),
      col("text").cast("binary").as("blob"),
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))

  /** STUB decode: a real decoder would parse the container header here
    * (image/audio libs are absent); the stub derives deterministic metadata
    * from the blob bytes so the full plumbing — binary column in, metadata
    * struct out, one narrow stage — is exercised and oracle-checked. */
  def mediaDecode(spark: SparkSession, d: String): DataFrame =
    media(spark, d).select(
      col("doc_id"), col("format"),
      length(col("blob")).as("n_bytes"),
      (lit(64) + (length(col("blob")) * 7) % 1856).as("width"),
      (lit(64) + (length(col("blob")) * 13) % 1016).as("height"))

  val mediaDecodeSql: String =
    """SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
      |  strlen(text) AS n_bytes,
      |  64 + (strlen(text) * 7) % 1856 AS width,
      |  64 + (strlen(text) * 13) % 1016 AS height
      |FROM documents""".stripMargin

  /** Frame sampling: every 4th frame of the stub-decoded clip — the explode
    * pattern used for video frame extraction (rows scale with frames, work
    * stays partition-local). */
  def mediaFrames(spark: SparkSession, d: String): DataFrame =
    mediaDecode(spark, d)
      .withColumn("n_frames", col("height") % 24 + 1)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(4))).as("frame_idx"))

  val mediaFramesSql: String =
    """WITH m AS (SELECT doc_id,
      |    (64 + (strlen(text) * 13) % 1016) % 24 + 1 AS n_frames
      |  FROM documents)
      |SELECT doc_id, i AS frame_idx
      |FROM m, (SELECT unnest(generate_series(0, 23, 4)) AS i)
      |WHERE i < n_frames""".stripMargin

  /** STUB resize: aspect-fit into a 256x256 box. The geometry is what a
    * real thumbnailer computes; all arithmetic is integer division so both
    * engines agree exactly. Narrow map stage. */
  def mediaResize(spark: SparkSession, d: String): DataFrame =
    mediaDecode(spark, d)
      .withColumn("out_w",
        when(col("width") >= col("height"), lit(256L))
          .otherwise(expr("width * 256 DIV height")))
      .withColumn("out_h",
        when(col("width") >= col("height"), expr("height * 256 DIV width"))
          .otherwise(lit(256L)))
      .select(col("doc_id"), col("width"), col("height"),
        col("out_w"), col("out_h"),
        (col("out_w") * col("out_h") * 3).as("out_bytes"))

  val mediaResizeSql: String =
    """WITH m AS (SELECT doc_id,
      |    64 + (strlen(text) * 7) % 1856 AS width,
      |    64 + (strlen(text) * 13) % 1016 AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      |  CASE WHEN width >= height THEN 256 ELSE width * 256 // height END AS out_w,
      |  CASE WHEN width >= height THEN height * 256 // width ELSE 256 END AS out_h,
      |  (CASE WHEN width >= height THEN 256 ELSE width * 256 // height END) *
      |  (CASE WHEN width >= height THEN height * 256 // width ELSE 256 END) * 3
      |    AS out_bytes
      |FROM m""".stripMargin

  /** STUB feature extraction: per-payload code-point statistics
    * (sum/min/max/distinct count) standing in for an embedding model's
    * featurizer. The UDF takes ONE string and loops over code points in JVM
    * code (array-typed ScalaUDF inputs pay ~19us/element in conversion; a
    * single string does not), returning a fixed-shape vector — the batch
    * shape a real feature extractor has. Code points (not UTF-16 units or
    * UTF-8 bytes) because DuckDB's `ord()` yields code points, keeping the
    * oracle exact for any unicode text, not just ASCII. */
  private val cpFeaturesUdf = udf((s: String) => {
    var sum = 0L
    var mn = Long.MaxValue
    var mx = 0L
    val seen = new java.util.HashSet[Int]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sum += cp
      if (cp < mn) mn = cp
      if (cp > mx) mx = cp
      seen.add(cp)
      i += Character.charCount(cp)
    }
    Array(sum, mn, mx, seen.size.toLong)
  })

  def mediaFeatures(spark: SparkSession, d: String): DataFrame =
    media(spark, d)
      .withColumn("f", cpFeaturesUdf(col("blob").cast("string")))
      .select(col("doc_id"), col("format"),
        col("f")(0).as("cp_sum"), col("f")(1).as("cp_min"),
        col("f")(2).as("cp_max"), col("f")(3).as("n_distinct_cp"))

  /** DuckDB: `length`/`text[i]` are character-based (unlike byte-based
    * `strlen`), and `ord` is the code point — matches codePointAt. */
  val mediaFeaturesSql: String =
    """WITH b AS (SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END
      |      AS format,
      |    list_transform(range(1, length(text) + 1), i -> ord(text[i])) AS cs
      |  FROM documents)
      |SELECT doc_id, format,
      |  CAST(list_sum(cs) AS BIGINT) AS cp_sum,
      |  CAST(list_min(cs) AS BIGINT) AS cp_min,
      |  CAST(list_max(cs) AS BIGINT) AS cp_max,
      |  CAST(len(list_distinct(cs)) AS BIGINT) AS n_distinct_cp
      |FROM b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_enrich"     -> (geoEnrich _),
    "media_decode"   -> (mediaDecode _),
    "media_frames"   -> (mediaFrames _),
    "media_resize"   -> (mediaResize _),
    "media_features" -> (mediaFeatures _))

  val oracles: Map[String, String] = Map(
    "geo_enrich"     -> geoEnrichSql,
    "media_decode"   -> mediaDecodeSql,
    "media_frames"   -> mediaFramesSql,
    "media_resize"   -> mediaResizeSql,
    "media_features" -> mediaFeaturesSql)
}
