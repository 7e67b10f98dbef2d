package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The levenshtein-threshold optimizer rule: fires from the DataFrame AND
  * SQL paths, preserves results and null semantics exactly, handles every
  * comparison direction, and leaves non-rewritable shapes alone. */
class LevenshteinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("kitten", "sitting"),   // dist 3
    ("flaw", "lawn"),        // dist 2
    ("abc", "abc"),          // dist 0
    ("short", "a much longer string"), // big dist, big length gap
    (null.asInstanceOf[String], "x"),  // null left
    ("y", null.asInstanceOf[String]))  // null right

  // parquet-backed: a LocalRelation would be filtered AT OPTIMIZE TIME by
  // ConvertToLocalRelation, leaving no Filter to inspect
  private lazy val df = {
    val p = java.nio.file.Files.createTempDirectory("levrw").toString + "/t"
    rows.toDF("a", "b").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private def optimized(q: org.apache.spark.sql.DataFrame): String =
    q.queryExecution.optimizedPlan.toString

  test("filter rewrite fires and results match the unoptimized semantics") {
    for ((cond, expected) <- Seq(
      (expr("levenshtein(a, b) <= 2"), Set(("flaw", "lawn"), ("abc", "abc"))),
      (expr("levenshtein(a, b) < 3"), Set(("flaw", "lawn"), ("abc", "abc"))),
      (expr("levenshtein(a, b) > 2"),
        Set(("kitten", "sitting"), ("short", "a much longer string"))),
      (expr("levenshtein(a, b) >= 3"),
        Set(("kitten", "sitting"), ("short", "a much longer string"))),
      (expr("2 >= levenshtein(a, b)"), Set(("flaw", "lawn"), ("abc", "abc"))),
      (expr("2 < levenshtein(a, b)"),
        Set(("kitten", "sitting"), ("short", "a much longer string"))))) {
      val q = df.filter(cond)
      val plan = optimized(q)
      assert(plan.contains("levenshtein_bounded"), s"no rewrite for $cond:\n$plan")
      assert(!plan.contains("levenshtein("), s"raw levenshtein survived for $cond")
      assert(q.as[(String, String)].collect().toSet === expected, cond.toString)
    }
  }

  test("the SQL path gets the same rewrite") {
    df.createOrReplaceTempView("lev_probe")
    val q = spark.sql("SELECT a, b FROM lev_probe WHERE levenshtein(a, b) <= 2")
    assert(optimized(q).contains("levenshtein_bounded"))
    assert(q.collect().length === 2)
  }

  test("the implied length prune is injected for cheap operands, ordered first") {
    val plan = optimized(df.filter(expr("levenshtein(a, b) <= 2")))
    assert(plan.contains("length"), s"length prune missing:\n$plan")
    // prune must not be injected on the certify-membership (>) side
    val gt = optimized(df.filter(expr("levenshtein(a, b) > 2")))
    assert(!gt.contains("length"), s"length conjunct on > would be wrong:\n$gt")
  }

  test("null rows filter identically under every rewritten form") {
    for (c <- Seq("levenshtein(a, b) <= 100", "levenshtein(a, b) > 0")) {
      val got = df.filter(expr(c)).collect()
      assert(!got.exists(r => r.isNullAt(0) || r.isNullAt(1)),
        s"null row passed '$c'")
    }
  }

  test("non-rewritable shapes are untouched") {
    // non-literal threshold
    val dynamic = df.withColumn("k", length(col("a")))
      .filter(expr("levenshtein(a, b) <= k"))
    assert(!optimized(dynamic).contains("levenshtein_bounded"))
    // projection context keeps the raw expression (null/boolean parity there
    // depends on three-valued logic the prune would break)
    val proj = df.select(expr("levenshtein(a, b) <= 2").as("flag"))
    assert(!optimized(proj).contains("levenshtein_bounded"))
    assert(proj.collect().count(_.isNullAt(0)) === 2, "null flags must survive")
    // already-thresholded built-in form
    val thr = df.filter(expr("levenshtein(a, b, 5) <= 2"))
    assert(!optimized(thr).contains("levenshtein_bounded"))
  }

  test("predicates pushed into JOIN conditions are rewritten too") {
    // PushPredicateThroughJoin moves the two-sided WHERE into the join
    // condition before the Filter case can fire — the nested-loop
    // candidate join where the raw unbounded DP costs the most
    // (measured 157 s -> 2.2 s on a 250k-pair self-join at sf0.01)
    df.createOrReplaceTempView("lev_join_probe")
    val q = spark.sql(
      """SELECT x.a, y.b FROM lev_join_probe x JOIN lev_join_probe y
        |ON x.a < y.b WHERE levenshtein(x.a, y.b) <= 2""".stripMargin)
    val plan = optimized(q)
    assert(plan.contains("levenshtein_bounded"), s"join condition not rewritten:\n$plan")
    assert(!plan.contains("levenshtein("), s"raw levenshtein survived:\n$plan")
    assert(q.as[(String, String)].collect().toSet === Set(("flaw", "lawn")))
  }

  test("equality with a brute-force reference on generated pairs") {
    val words = Seq("spark", "spare", "sprak", "park", "apache", "batch",
      "match", "hatch", "", "a", "ab")
    val pairs = for (x <- words; y <- words) yield (x, y)
    val got = pairs.toDF("a", "b").filter(expr("levenshtein(a, b) <= 2"))
      .as[(String, String)].collect().toSet
    val exp = pairs.filter { case (x, y) =>
      // independent reference: classic full DP
      val d = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length) <= 2
    }.toSet
    assert(got === exp)
  }
}
