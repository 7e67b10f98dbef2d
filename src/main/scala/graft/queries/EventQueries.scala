package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table — the Spark-native
  * re-expression of the reference's stream-level semantics (SURVEY.md §2D):
  * sessionization (30-minute sliding inactivity window, reference
  * `resources/divolte.js:27`, `config/BrowserSourceConfiguration.java:40`),
  * duplicate detection (`ShortTermDuplicateMemory.java:108-178` — here as the
  * exact batch semantics: first-occurrence-wins per event key), event-parameter
  * extraction (`DslRecordMapping.java:575-632`), and the downstream rollups the
  * reference delegates to Spark (`docs/introduction.rst:110-113`).
  *
  * Scale notes: every query here shuffles once on its natural key
  * (user_id or the group-by key) and aggregates partially map-side first.
  * Timestamps are normalized to epoch millis *before* any gap arithmetic so
  * the logic is precision-stable (parquet ns → Spark us truncation).
  */
object EventQueries {

  private val SessionGapMs = 30 * 60 * 1000L // reference: 30-min inactivity

  /** events with ts as epoch-millis (ns parquet -> ms, floor). */
  private def ev(spark: SparkSession, d: String): DataFrame =
    events(spark, d).withColumn("ts_ms", unix_millis(col("ts").cast("timestamp")))

  // ------------------------------------------------------------ mapping
  /** The per-event "mapping program" analog of the reference's default
    * mapping (`Mapping.java:70-100`): pure projection + JSON parameter
    * extraction + derived fields, all codegen'd built-ins — one narrow
    * stage, no shuffle at any scale. `get_json_object` ≡ the reference's
    * `eventParameters().value(name)` producer. */
  def mapping(spark: SparkSession, d: String): DataFrame =
    ev(spark, d).select(
      col("event_id"),
      col("ts_ms"),
      col("user_id"),
      col("event_type"),
      col("value"),
      get_json_object(col("props"), "$.k").cast("int").as("param_k"),
      (col("event_type") === "purchase").as("is_purchase"),
      floor(col("value") / 50).cast("long").as("value_bucket"))

  val mappingSql: String =
    """SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value,
      |  CAST(json_extract_string(props, 'k') AS INT) AS param_k,
      |  event_type = 'purchase' AS is_purchase,
      |  CAST(FLOOR(value / 50) AS BIGINT) AS value_bucket
      |FROM events""".stripMargin

  // ------------------------------------------------------------ sessionize
  /** Sessionization via Spark's native `session_window` (gap-close semantics
    * identical to the reference's sliding 30-min inactivity timeout). One
    * shuffle on user_id; state merges map-side. In streaming mode the same
    * expression runs under a watermark (see graft.streaming). Output: one
    * row per (user, session) with start/end/count/value. */
  def sessionize(spark: SparkSession, d: String): DataFrame =
    ev(spark, d)
      .groupBy(col("user_id"), session_window(col("ts").cast("timestamp"), "30 minutes"))
      .agg(
        min(col("ts_ms")).as("session_start_ms"),
        max(col("ts_ms")).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .drop("session_window")

  val sessionizeSql: String =
    """WITH t AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events
      |), flagged AS (
      |  SELECT *, CASE WHEN ts_ms - LAG(ts_ms) OVER w > 1800000 OR
      |                      LAG(ts_ms) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
      |), sessioned AS (
      |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms
      |                             ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged
      |)
      |SELECT user_id, MIN(ts_ms) AS session_start_ms, MAX(ts_ms) AS session_end_ms,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM sessioned GROUP BY user_id, sid""".stripMargin

  // ------------------------------------------------------------ dedup (exact)
  /** Exact duplicate detection, batch form of the reference's probabilistic
    * `ShortTermDuplicateMemory` (first occurrence survives, later identical
    * keys are flagged): ranked window over the event key. The reference keys
    * on (partyId, sessionId, eventId); here the analog key is
    * (user_id, event_type, props). Returns the surviving rows. */
  def dedupExact(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("props"))
      .orderBy(col("ts_ms"), col("event_id"))
    ev(spark, d)
      .select(col("user_id"), col("event_type"), col("props"), col("ts_ms"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  val dedupExactSql: String =
    """SELECT user_id, event_type, props, ts_ms, event_id FROM (
      |  SELECT user_id, event_type, props, epoch_ms(ts) AS ts_ms, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type, props
      |                       ORDER BY epoch_ms(ts), event_id) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  // ------------------------------------------------------------ daily rollup
  /** Daily activity rollup: the canonical downstream aggregate. Day is
    * emitted as a string so the oracle compare is type-stable. */
  def dailyRollup(spark: SparkSession, d: String): DataFrame =
    ev(spark, d)
      .groupBy(
        date_format(col("ts").cast("timestamp"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))

  val dailyRollupSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------ funnel
  /** Signup→purchase conversion funnel: per-user min timestamps, one shuffle
    * on user_id, then a scalar conditional aggregate. */
  def funnel(spark: SparkSession, d: String): DataFrame =
    ev(spark, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", col("ts_ms"))).as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts_ms"))).as("first_purchase"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("first_signup")).as("n_signed_up"),
        // COUNT (not SUM) so both engines emit a non-nullable int64: DuckDB's
        // nullable SUM comes back as float64 through pandas and hash-mismatches.
        count(when(col("first_purchase") > col("first_signup"), lit(1))).as("n_converted"))

  val funnelSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup'   THEN epoch_ms(ts) END) AS first_signup,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END) AS first_purchase
      |  FROM events GROUP BY user_id)
      |SELECT COUNT(*) AS n_users,
      |  COUNT(first_signup) AS n_signed_up,
      |  COUNT(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_converted
      |FROM u""".stripMargin

  // ------------------------------------------------------------ top users
  /** Top-10 purchasers — global top-N: partial top-N per partition via the
    * sort+limit (Spark plans TakeOrderedAndProject: no full sort at scale). */
  def topUsers(spark: SparkSession, d: String): DataFrame =
    ev(spark, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_spend"),
        count(lit(1)).as("n_purchases"))
      .orderBy(col("total_spend").desc, col("user_id"))
      .limit(10)

  val topUsersSql: String =
    """SELECT user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
      |  COUNT(*) AS n_purchases
      |FROM events WHERE event_type = 'purchase'
      |GROUP BY user_id ORDER BY total_spend DESC, user_id LIMIT 10""".stripMargin

  // ------------------------------------------------------------ sketches
  /** Approximate rollup — the 100 TB form of evt_daily_rollup: HLL distinct
    * users (mergeable, constant memory per group vs exact COUNT DISTINCT's
    * second shuffle) and approximate value percentiles. Non-oracled (sketch
    * outputs are engine-specific); accuracy vs exact is asserted in
    * SketchSpec. */
  def dailyRollupApprox(spark: SparkSession, d: String): DataFrame =
    ev(spark, d)
      .groupBy(
        date_format(col("ts").cast("timestamp"), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        approx_percentile(col("value"), lit(0.5), lit(1000)).as("p50_value"),
        approx_percentile(col("value"), lit(0.95), lit(1000)).as("p95_value"))

  // ------------------------------------------------------------ jsonpath
  /** The full JSONPath dialect of `eventParameters().path(expr)` over the
    * event props (`DslRecordMapping.java:587-594` — jayway json-path 2.4):
    * a simple definite path (routes to codegen'd get_json_object), a
    * recursive descent, and a filter predicate, each mirrored exactly by
    * DuckDB json functions / reconstruction in the oracle. */
  def paramPath(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.jsonPath
    events(spark, d).select(
      col("event_id"),
      jsonPath(col("props"), "$.k").cast("long").as("k_simple"),
      jsonPath(col("props"), "$..k").as("k_descend"),
      jsonPath(concat(lit("["), col("props"), lit("]")), "$[?(@.k > 50)]")
        .as("k_filtered"),
      jsonPath(col("props"), "$.missing").as("k_missing"))
  }

  val paramPathSql: String =
    """SELECT event_id,
      |  json_extract(props, '$.k')::BIGINT AS k_simple,
      |  '[' || json_extract(props, '$.k') || ']' AS k_descend,
      |  CASE WHEN json_extract(props, '$.k')::BIGINT > 50
      |       THEN '[{"k":' || json_extract(props, '$.k') || '}]'
      |       ELSE '[]' END AS k_filtered,
      |  NULL::VARCHAR AS k_missing
      |FROM events""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "evt_param_path"          -> (paramPath _),
    "evt_daily_rollup_approx" -> (dailyRollupApprox _),
    "evt_mapping"      -> (mapping _),
    "evt_sessionize"   -> (sessionize _),
    "evt_dedup_exact"  -> (dedupExact _),
    "evt_daily_rollup" -> (dailyRollup _),
    "evt_funnel"       -> (funnel _),
    "evt_top_users"    -> (topUsers _))

  val oracles: Map[String, String] = Map(
    "evt_param_path"   -> paramPathSql,
    "evt_mapping"      -> mappingSql,
    "evt_sessionize"   -> sessionizeSql,
    "evt_dedup_exact"  -> dedupExactSql,
    "evt_daily_rollup" -> dailyRollupSql,
    "evt_funnel"       -> funnelSql,
    "evt_top_users"    -> topUsersSql)
}
