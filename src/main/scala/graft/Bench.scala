package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build(cpus, "graft-bench")
    // experiment knob: measure AQE's per-query replan overhead on tiny data
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    // Warm the JVM/session once so the first timed query isn't charged for
    // infra startup: a parquet scan (FileIndex/footer machinery), a shuffle
    // + window + join (exchange and sort JIT), and a first whole-stage
    // codegen compile (janino classloader warm). Measured ~2.5s charged to
    // whichever query happened to run first without this.
    spark.range(1000).selectExpr("sum(id)").collect()
    val warm = spark.read.parquet(s"$sfDir/region.parquet")
      .selectExpr("r_regionkey", "r_name")
    warm.join(warm.selectExpr("r_regionkey").limit(2), "r_regionkey")
      .groupBy("r_name").count()
      .selectExpr("r_name", "count",
        "row_number() over (partition by r_name order by count) rk")
      .collect()
    // FileIndex/footer discovery is per TABLE and would otherwise be charged
    // to whichever query happens to touch each table first (a cluster keeps
    // these hot in the metastore/FileIndex cache); read one row from each
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      // best-effort: a missing table must degrade that table's queries
      // (they report -1 below), not abort the whole bench
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
      catch { case _: Throwable => }
    }
    // Each query is timed twice: run1 (cold — includes that query's one-time
    // plan/codegen/JIT cost) and run2 (steady state). `value`/`queries` stay
    // the cold timings for cross-round continuity; `value_warm`/
    // `queries_warm` report steady state, which is the scale-relevant number
    // (a cluster query amortizes its ~1s planning over minutes of execution,
    // and the reference's 12-15k req/s/thread is itself a sustained rate).
    def time(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      // toRdd.count() materializes every output column — a plain count()
      // would let Catalyst prune the projections under narrow queries and
      // time an empty scan instead of the actual operator work.
      // A failed query reports -1 (not its time-to-failure, which would be
      // indistinguishable from a fast success in the JSON).
      try {
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] query failed: $e")
          -1.0
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val cold = time(fn)
      val warm = time(fn)
      // live progress on stderr: localizes any whole-JVM degradation to the
      // point in the run where it starts (the final JSON only shows totals)
      System.err.println(f"[bench] $name cold=$cold%.2f warm=$warm%.2f")
      name -> (cold, warm)
    }
    def obj(sel: ((Double, Double)) => Double): String = results
      .map { case (k, v) => s"\"" + k + "\":" + sel(v) }.mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    val totalWarm = results.values.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(_._1)},""" +
      s""""value_warm":$totalWarm,"queries_warm":${obj(_._2)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
