package graft

/** Time a single named query: `runMain graft.BenchOne <name> [sfDir]`.
  * Runs the query twice (cold incl. per-query codegen, then warm) with the
  * same full-output materialization Bench uses, so the steady-state cost is
  * visible separately from one-time JIT/codegen. Each run prints the same
  * (selfCpu/wall, taskCpuFrac, ext, gc) quality fields as Bench — an idle
  * re-timing is only evidence if it carries its own uncontended proof. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-bench1")
    // A/B experiments without recompiling: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"
    // (runtime confs only — the graft.* knobs are read at query-build time)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    BenchSampler.install(spark)
    val hostCores = Runtime.getRuntime.availableProcessors
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    (1 to 2).foreach { i =>
      var n = 0L
      val s = BenchSampler.sample(hostCores) {
        n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      }
      val dirty = BenchSampler.dirtyReasons(s, extThreshold = 0.15, minWall = 0.3)
      println(f"[bench1] $name run$i rows=$n sec=${s.wall}%.2f " +
        f"self=${s.selfRatio}%.1f tcpu=${s.taskCpuFrac}%.2f ext=${s.ext}%.2f " +
        f"gc=${s.gcMs}ms" +
        (if (dirty.isEmpty) "" else s" DIRTY=${dirty.mkString("+")}"))
    }
    spark.stop()
  }
}
