package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair/edge table — the scale path
  * for near-duplicate cluster resolution when the pair graph outgrows
  * driver memory (the small-graph path is the driver union-find in
  * `DocQueries.dedupClusters`; both produce identical component-minimum
  * labels).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round joins labels across edges and keeps the minimum
  * of (own label, neighbors' labels); fixpoint when no label changes.
  * Rounds are bounded by the graph diameter — near-dup cluster graphs are
  * shallow (dup groups are near-cliques, diameter ≲ 3) so this converges in
  * a handful of rounds. Each round is one shuffle whose min-agg partially
  * aggregates map-side; the edge table is re-used across rounds (cache it
  * for iteration, as `components` does).
  */
object Components {

  /** Component-minimum label per node of the undirected edge set
    * (`srcCol`, `dstCol`). Output: (node, label). Nodes not in any edge are
    * absent (callers left-join and coalesce to self, exactly like the
    * union-find path). */
  def components(edges0: DataFrame, srcCol: String, dstCol: String,
                 maxIters: Int = 25): DataFrame = {
    val fwd = edges0.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).cache()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .select(col("src").as("node"), col("label"))
      val next = labels.union(viaNeighbor)
        .groupBy("node").agg(min("label").as("label")).cache()
      converged = next.join(
          labels.withColumnRenamed("label", "prev"), "node")
        .filter(col("label") < col("prev")).isEmpty
      labels.unpersist()
      labels = next
      it += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge in $maxIters rounds " +
          "(graph diameter exceeds maxIters); raise maxIters")
    labels
  }
}
