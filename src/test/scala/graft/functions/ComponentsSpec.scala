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
    // every labeled node matches the union-find canonical id
    val joined = viaPropagation
      .join(graft.queries.DocQueries.dedupClusters(spark, sf),
        col("node") === col("doc_id"))
    assert(viaPropagation.count() > 0)
    assert(joined.count() === viaPropagation.count()) // every node joined
    assert(joined.filter(col("label") =!= col("canonical_doc_id")).isEmpty)
  }

  test("non-convergence within maxIters throws instead of mislabeling") {
    import spark.implicits._
    // a 6-node path has diameter 5; 2 rounds cannot converge
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("d1", "d2")
    intercept[IllegalStateException](
      Components.components(chain, "d1", "d2", maxIters = 2).collect())
  }
}
