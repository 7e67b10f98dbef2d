package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed label propagation: identical labels to the driver union-find
  * path, on both a synthetic graph and the real near-dup pair graph. */
class ComponentsSpec extends SparkSpec {

  test("chain and islands resolve to component minima") {
    import spark.implicits._
    // 1-2-3-4 chain (diameter 3), 10-11 island, 20-21-22 triangle
    val edges = Seq((2L, 1L), (3L, 2L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("d1", "d2")
    val labels = Components.components(edges, "d1", "d2")
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(labels(_) == 20L))
  }

  test("labels agree with the driver union-find on the near-dup pair graph") {
    val sf = "/root/testdata/sf0.01"
    val pairs = graft.queries.DocQueries.neardupJaccard(spark, sf)
    val viaPropagation = Components.components(pairs, "d1", "d2")
    val viaUnionFind = graft.queries.DocQueries.dedupClusters(spark, sf)
      .filter(col("is_duplicate") || col("doc_id") =!= col("canonical_doc_id"))
    // every labeled node matches the union-find canonical id
    val joined = viaPropagation
      .join(graft.queries.DocQueries.dedupClusters(spark, sf),
        col("node") === col("doc_id"))
    assert(joined.filter(col("label") =!= col("canonical_doc_id")).isEmpty)
    assert(viaPropagation.count() > 0)
    assert(viaUnionFind.count() >= 0) // touched: both paths ran on real data
  }
}
