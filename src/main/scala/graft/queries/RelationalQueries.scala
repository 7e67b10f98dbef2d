package graft.queries

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational query surface — the downstream analytics layer the
  * reference delegates to Spark (reference `README.md:27-33`,
  * `docs/introduction.rst:110-113`; see SURVEY.md §2 tail + §7.1 `queries`).
  *
  * Scale notes (100 TB design intent):
  *  - fact-side filters appear before joins so Catalyst pushes them into the
  *    parquet scan (verify with `.explain`: PushedFilters / ReadSchema);
  *  - dimension tables (region/nation/supplier/customer/part) are explicitly
  *    `broadcast()`-hinted — at warehouse scale these stay O(MB..GB) while
  *    facts are O(TB), so every dim join is a map-side hash join, no shuffle;
  *  - aggregates are plain `groupBy.agg` → Spark performs partial (map-side)
  *    aggregation automatically; the only shuffles left are the final
  *    group-by-key exchanges, which AQE coalesces at runtime.
  *
  * Oracle-parity notes: money math is done in exact DECIMAL so the sum is
  * order-independent (double summation is not associative — hash-compare vs
  * DuckDB would flake), then cast to DOUBLE at the output edge.
  */
object RelationalQueries {

  /** `l_extendedprice` as an exact decimal: values are 2-dp. */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  /** Exact revenue term: price * (1 - discount), all in decimal. */
  private def revenue: Column =
    (dec(col("l_extendedprice")) * (lit(1).cast("decimal(3,2)") - dec(col("l_discount")).cast("decimal(3,2)")))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1-style pricing summary: scan-heavy, pure partial-agg pipeline.
    * At 100 TB this is the canonical "one pass over the fact table" query:
    * only 8 of 11 lineitem columns are read (column pruning) and the
    * group-by cardinality is tiny (|flag|x|status| ~ 6), so the shuffle
    * after partial aggregation moves a few KB regardless of input size. */
  def q1(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(revenue).cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(REVEXPR) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin
      .replace("REVEXPR", revenueSql)

  // ---------------------------------------------------------------- q3
  /** TPC-H Q3-style: selective dim filter -> broadcast join -> top-N.
    * customer is filtered then broadcast (a 1/5 mktsegment slice of the
    * customer dim is small even at SF-100k); orders/lineitem join shuffles
    * on orderkey — both sides are pre-filtered so the shuffle carries only
    * the date-qualified slice. Top-N uses a total order with a unique
    * tie-break key so LIMIT is deterministic for the oracle. */
  def q3(spark: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1997-03-15").cast("timestamp")
    val c = customer(spark, d).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = orders(spark, d).filter(col("o_orderdate") < cutoff)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val l = lineitem(spark, d).filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), revenue.as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
      .withColumn("o_orderdate_ms", unix_millis(col("o_orderdate").cast("timestamp")))
      .drop("o_orderdate")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    """SELECT l_orderkey, o_orderpriority,
      |  CAST(SUM(REVEXPR) AS DOUBLE) AS revenue,
      |  epoch_ms(o_orderdate) AS o_orderdate_ms
      |FROM lineitem, orders, customer
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-03-15'
      |  AND l_shipdate  > TIMESTAMP '1997-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
      .replace("REVEXPR", revenueSql)

  // ---------------------------------------------------------------- q5
  /** TPC-H Q5-style star join: region->nation->(customer,supplier) are all
    * broadcast; the only shuffle is lineitem x orders on orderkey plus the
    * final tiny group-by. The c_nationkey = s_nationkey condition rides on
    * the broadcast hash join of the supplier dim. */
  def q5(spark: SparkSession, d: String): DataFrame = {
    val n = nation(spark, d).join(
      broadcast(region(spark, d).filter(col("r_name") === "ASIA")),
      col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = customer(spark, d).join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val s = supplier(spark, d).select("s_suppkey", "s_nationkey")
    val o = orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"), revenue.as("rev"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
                          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
  }

  val q5Sql: String =
    """SELECT n_name, CAST(SUM(REVEXPR) AS DOUBLE) AS revenue
      |FROM lineitem, orders, customer, supplier, nation, region
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin
      .replace("REVEXPR", revenueSql)

  // ---------------------------------------------------------------- q7
  /** TPC-H Q7-style volume shipping: bilateral trade (supplier nation ↔
    * customer nation) by ship year for two chosen nations. The classic
    * many-dim star: the fact table (lineitem) is scanned ONCE and every
    * other input — orders is keyed fact-sized in real TPC-H, but the
    * nation-filtered customer/supplier sides here — broadcasts, so the
    * only big exchange is the lineitem↔orders key join; the nation-pair
    * filter applies BEFORE the join via the broadcast hash sides (row
    * reduction at the scan, not post-join). Exact decimal money, double at
    * the edge. */
  def q7(spark: SparkSession, d: String): DataFrame = {
    val picked = Seq("NATION_3", "NATION_7")
    val n = nation(spark, d)
      .filter(col("n_name").isInCollection(picked))
      .select(col("n_nationkey"), col("n_name"))
    val s = supplier(spark, d)
      .join(broadcast(n.select(col("n_nationkey").as("sk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sk"))
      .select("s_suppkey", "supp_nation")
    val c = customer(spark, d)
      .join(broadcast(n.select(col("n_nationkey").as("ck"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("ck"))
      .select("c_custkey", "cust_nation")
    val o = orders(spark, d).select("o_orderkey", "o_custkey")
    lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), revenue.as("rev"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev")).cast("double").as("revenue"))
  }

  val q7Sql: String =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(SUM(volume) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    year(l_shipdate) AS l_year, REVEXPR AS volume
      |  FROM lineitem, orders, customer, supplier, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |    AND c_nationkey = n2.n_nationkey
      |    AND n1.n_name IN ('NATION_3', 'NATION_7')
      |    AND n2.n_name IN ('NATION_3', 'NATION_7')
      |    AND n1.n_name <> n2.n_name
      |    AND l_shipdate >= TIMESTAMP '1995-01-01'
      |    AND l_shipdate <  TIMESTAMP '1997-01-01')
      |GROUP BY 1, 2, 3""".stripMargin
      .replace("REVEXPR", revenueSql)

  // ---------------------------------------------------------------- q13
  /** TPC-H Q13-style customer distribution: how many customers placed k
    * orders (k = 0 included — the LEFT join is the point). Two-phase
    * aggregation: phase 1 shuffles on the join/group key (custkey — both
    * sides large, a legitimate sort-merge), phase 2 groups by the tiny
    * order-count domain, so the second exchange moves |distinct k| rows.
    * The zero bucket cannot be produced by any inner-join formulation —
    * it is the classic "count absent children" outer-join shape. */
  def q13(spark: SparkSession, d: String): DataFrame = {
    val o = orders(spark, d)
      .filter(!col("o_orderpriority").startsWith("1-URGENT"))
      .select("o_orderkey", "o_custkey")
    customer(spark, d).select("c_custkey")
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1-URGENT%'
      |  GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  // ---------------------------------------------------------------- q10
  /** TPC-H Q10-style returned-item ranking: revenue lost to returns per
    * customer in a quarter, top 20. Fact scan with pushed returnflag +
    * date predicates → one key join to the (filtered) orders → broadcast
    * customer attributes onto the 20-row result is the real-cluster plan;
    * here customer broadcasts pre-agg (it is dim-sized). Top-k is
    * TakeOrderedAndProject, never a global sort. */
  def q10(spark: SparkSession, d: String): DataFrame = {
    val o = orders(spark, d)
      .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val rev = lineitem(spark, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revenue.as("rev"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("drev"))
    rev.join(broadcast(customer(spark, d)
        .select("c_custkey", "c_name", "c_acctbal")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("c_acctbal"),
        col("drev").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS c_acctbal,
      |  CAST(SUM(REVEXPR) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1995-10-01'
      |  AND o_orderdate <  TIMESTAMP '1996-01-01'
      |  AND l_returnflag = 'R'
      |GROUP BY 1, 2, 3
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
      .replace("REVEXPR", revenueSql)

  // ---------------------------------------------------------------- q18
  /** TPC-H Q18-style large-volume customers: orders whose total lineitem
    * quantity clears a threshold, with the buyer attached. The classic
    * aggregate-HAVING semi-join: the fact table aggregates FIRST (one
    * map-side-combinable shuffle on orderkey, quantities in exact
    * decimal), the tiny surviving set then joins orders and broadcast
    * customer — never orders x lineitem before the filter. Top-k by
    * quantity is TakeOrdered. */
  private val Q18MinQty = 300
  def q18(spark: SparkSession, d: String): DataFrame = {
    val bulky = lineitem(spark, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > Q18MinQty)
    bulky
      .join(orders(spark, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(spark, d).select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("total_qty").cast("double").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  val q18Sql: String =
    s"""WITH bulky AS (
       |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
       |  FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > $Q18MinQty)
       |SELECT c_custkey, c_name, o_orderkey,
       |  ROUND(o_totalprice, 2) AS o_totalprice,
       |  CAST(total_qty AS DOUBLE) AS total_qty
       |FROM bulky, orders, customer
       |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
       |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q6
  /** TPC-H Q6-style: the pure-pushdown query. All three predicates reach the
    * parquet scan as PushedFilters; output is a single row — zero shuffle
    * beyond the final partial-agg gather. */
  def q6(spark: SparkSession, d: String): DataFrame =
    lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")).cast("decimal(3,2)"))
        .cast("double").as("revenue"))

  val q6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |                CAST(CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(3,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q4
  /** TPC-H Q4-style EXISTS via left-semi join: the semi join shuffles both
    * sides on orderkey but materializes nothing from the lineitem side —
    * at scale the semi-join build side is only the distinct orderkeys. */
  def q4(spark: SparkSession, d: String): DataFrame = {
    val o = orders(spark, d)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-10-01").cast("timestamp"))
    val l = lineitem(spark, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      |  AND o_orderdate <  TIMESTAMP '1996-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- window top-n
  /** Per-group top-N via ranked window — the scalable idiom for "top 3 parts
    * per brand" (shuffle on the partition key once, no self-join). Unique
    * tie-break on p_partkey keeps the result deterministic. */
  def topnWindow(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    part(spark, d)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
  }

  val topnWindowSql: String =
    """SELECT p_brand, p_partkey, p_retailprice, rk FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    ROW_NUMBER() OVER (PARTITION BY p_brand
      |                       ORDER BY p_retailprice DESC, p_partkey) AS rk
      |  FROM part) WHERE rk <= 3""".stripMargin

  // ---------------------------------------------------------------- rollup
  /** Multi-level aggregate via ROLLUP (region -> nation -> total): one
    * shuffle, grouping-sets expansion handled by Catalyst's Expand node. */
  def rollupRevenue(spark: SparkSession, d: String): DataFrame = {
    val n = nation(spark, d).join(broadcast(region(spark, d)),
      col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
    customer(spark, d)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_acctbal"),
           count(lit(1)).as("n_customers"))
  }

  val rollupRevenueSql: String =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
      |  COUNT(*) AS n_customers
      |FROM customer, nation, region
      |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1 _),
    "q3_top_orders"      -> (q3 _),
    "q4_order_priority"  -> (q4 _),
    "q5_local_revenue"   -> (q5 _),
    "q6_forecast"        -> (q6 _),
    "q7_volume_shipping" -> (q7 _),
    "q10_returned_items" -> (q10 _),
    "q13_custdist"       -> (q13 _),
    "q18_bulky_orders"   -> (q18 _),
    "topn_window"        -> (topnWindow _),
    "rollup_acctbal"     -> (rollupRevenue _))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Sql,
    "q3_top_orders"      -> q3Sql,
    "q4_order_priority"  -> q4Sql,
    "q5_local_revenue"   -> q5Sql,
    "q6_forecast"        -> q6Sql,
    "q7_volume_shipping" -> q7Sql,
    "q10_returned_items" -> q10Sql,
    "q13_custdist"       -> q13Sql,
    "q18_bulky_orders"   -> q18Sql,
    "topn_window"        -> topnWindowSql,
    "rollup_acctbal"     -> rollupRevenueSql)
}
