package graft

/** Dump formatted physical plans for the headline queries —
  * `runMain graft.Plans [sfDir]` — the .explain review loop (plan-shape
  * assertions live in PlanSpec). */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.build(8, "graft-plans")
    Seq("q1_pricing_summary", "q6_forecast", "q3_top_orders", "q5_local_revenue",
        "evt_sessionize", "dsl_default_mapping", "emb_knn_brute").foreach { name =>
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
