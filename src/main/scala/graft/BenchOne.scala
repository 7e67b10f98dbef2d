package graft

/** Time a single named query: `runMain graft.BenchOne <name> [sfDir]`. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-bench1")
    spark.range(1000).selectExpr("sum(id)").collect() // warm
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"[bench1] $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.stop()
  }
}
