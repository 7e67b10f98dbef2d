package graft

/** Time a single named query: `runMain graft.BenchOne <name> [sfDir]`.
  * Runs the query twice (cold incl. per-query codegen, then warm) with the
  * same full-output materialization Bench uses, so the steady-state cost is
  * visible separately from one-time JIT/codegen. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-bench1")
    // A/B experiments without recompiling: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    // (runtime confs only — the graft.* knobs are read at query-build time)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(f"[bench1] $name run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
