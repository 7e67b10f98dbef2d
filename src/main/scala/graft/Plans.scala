package graft

/** Dump physical plans for the headline queries (or any named ones) —
  * `runMain graft.Plans [sfDir] [query ...]` — the .explain review loop
  * (plan-shape assertions live in PlanSpec). With explicit query names the
  * query is also EXECUTED first and the AQE-final plan printed, which is
  * the one that matters for join-strategy questions. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val named = args.drop(1).toSeq
    val spark = GraftSession.build(8, "graft-plans")
    val queries = if (named.nonEmpty) named
      else Seq("q1_pricing_summary", "q6_forecast", "q3_top_orders",
        "q5_local_revenue", "evt_sessionize", "dsl_default_mapping",
        "emb_knn_brute")
    queries.foreach { name =>
      println(s"========== $name ==========")
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (named.nonEmpty) {
        df.queryExecution.toRdd.count()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
