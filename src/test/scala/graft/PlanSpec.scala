package graft

import graft.queries.RelationalQueries
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the properties that make these queries survive a
  * 100x scale-up must hold in the physical plan, not just in intent. */
class PlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q1/q6: predicates reach the parquet scan (PushedFilters)") {
    val p1 = plan(RelationalQueries.q1(spark, sf))
    assert(p1.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    val p6 = plan(RelationalQueries.q6(spark, sf))
    assert(p6.contains("GreaterThanOrEqual(l_discount,0.05)"))
    assert(p6.contains("LessThan(l_quantity,24.0)"))
  }

  test("q1: column pruning — only needed lineitem columns are read") {
    val p = plan(RelationalQueries.q1(spark, sf))
    assert(p.contains("l_quantity"))
    assert(!p.contains("l_partkey"), "unused column not pruned from scan")
  }

  test("q3: dims broadcast; top-N is TakeOrderedAndProject, not global sort") {
    val p = plan(RelationalQueries.q3(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q5: star join is all broadcast hash joins (no sort-merge at dim scale)") {
    val p = plan(RelationalQueries.q5(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("flagship entry produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
