package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property test of the HNSW beam walk against a reference interpreter —
  * the same double-pinning pattern `MappingDslPropertySpec` applies to the
  * DSL compiler, here for the ONE query the DuckDB gate cannot replay
  * (`emb_hnsw_search`, ContractSpec's single no-oracle allowlist entry).
  *
  * The reference side is an independent transcription of Malkov &
  * Yashunin's Algorithm 2 (SEARCH-LAYER) and Algorithm 5 (K-NN-SEARCH,
  * greedy descent + level-0 beam) using deliberately naive data
  * structures: immutable Vectors re-sorted at every step, min/max found by
  * full scans — no priority queues, no visited-set/heap interplay to get
  * subtly wrong the same way twice. The production walk
  * ([[Hnsw.Graph.search]]) uses twin priority queues with an early-exit
  * and an admission gate; if either diverges from the paper's semantics on
  * ANY reachable input, these trees differ.
  *
  * Two properties, both over random adversarial graphs (duplicate vectors
  * for distance ties, zero vectors for the sentinel-distance path, integer
  * coordinate grids so exact double ties actually occur, non-contiguous
  * ids so id-tiebreaks are distinguishable from index-tiebreaks):
  *
  *  1. WALK PARITY: for every (graph, query, ef, k) the production walk
  *     returns byte-identical (id, dist) rows to the reference walk —
  *     including sub-exhaustive ef, where both may miss true neighbors but
  *     must miss the SAME ones.
  *  2. EXHAUSTIVE TRUTH: for ef ≥ |level-0 component| the walk visits the
  *     whole component, so the result must equal brute-force top-k over
  *     the BFS-reachable set — ground truth independent of any walk.
  *
  * Seed fixed per the round-gate reproducibility rule (commit 0ce0745). */
class HnswPropertySpec extends AnyFunSuite {

  // ---------------------------------------------------- reference walk
  /** (distance, then id) — the deterministic total order of the paper's
    * tie-broken variant the production graph documents. */
  private def key(g: Hnsw.Graph)(t: (Double, Int)): (Double, Long) =
    (t._1, g.ids(t._2))

  /** Algorithm 2, naive structures: `cand` = unexpanded frontier, `res` =
    * best-ef found; both plain Vectors, extremes by full sort/scan. */
  private def refSearchLayer(g: Hnsw.Graph, q: Array[Float],
      entryPts: Seq[Int], ef: Int, level: Int): Vector[(Double, Int)] = {
    val k = key(g) _
    var visited = Set.empty[Int]
    var cand = Vector.empty[(Double, Int)]
    var res = Vector.empty[(Double, Int)]
    entryPts.foreach { p =>
      if (!visited(p)) {
        visited += p
        val dp = Hnsw.cosineDist(g.vecs(p), q)
        cand :+= ((dp, p)); res :+= ((dp, p))
      }
    }
    res = res.sortBy(k).take(ef)
    var done = false
    while (!done && cand.nonEmpty) {
      val c = cand.minBy(k)
      cand = cand.filterNot(_._2 == c._2)
      val worst = res.maxBy(k)
      // strict distance comparison, no id tie-break — expansion continues
      // through equal-distance frontiers (the paper's `> distance(f, q)`)
      if (c._1 > worst._1 && res.size >= ef) done = true
      else g.neighbors(c._2)(level).foreach { n =>
        if (!visited(n)) {
          visited += n
          val dn = Hnsw.cosineDist(g.vecs(n), q)
          val w = res.maxBy(k)
          if (res.size < ef || dn < w._1 ||
              (dn == w._1 && g.ids(n) < g.ids(w._2))) {
            cand :+= ((dn, n))
            res = (res :+ ((dn, n))).sortBy(k).take(ef)
          }
        }
      }
    }
    res.sortBy(k)
  }

  /** Algorithm 5's greedy (dist, id)-descent through levels > 0. Mirrors
    * the production scan's update-in-place semantics (later neighbors
    * compare against the NEW current best). */
  private def refDescend(g: Hnsw.Graph, q: Array[Float]): Int = {
    var ep = g.entry
    var l = g.maxLevel
    while (l > 0) {
      var changed = true
      while (changed) {
        changed = false
        var bestD = Hnsw.cosineDist(g.vecs(ep), q)
        g.neighbors(ep)(l).foreach { n =>
          val dn = Hnsw.cosineDist(g.vecs(n), q)
          if (dn < bestD || (dn == bestD && g.ids(n) < g.ids(ep))) {
            bestD = dn; ep = n; changed = true
          }
        }
      }
      l -= 1
    }
    ep
  }

  /** Algorithm 5: descent, then one level-0 beam. */
  private def refSearch(g: Hnsw.Graph, q: Array[Float], ef: Int,
      k: Int): Vector[(Long, Double)] = {
    if (g.entry < 0) return Vector.empty
    refSearchLayer(g, q, Seq(refDescend(g, q)), math.max(ef, k), 0)
      .take(k).map { case (d, i) => (g.ids(i), d) }
  }

  /** Level-0 nodes reachable from `start` — what any walk FROM THAT START
    * can possibly see. Directed: insert links bidirectionally but `prune`
    * drops entries one-sidedly, so reachability depends on the start node
    * (which the greedy descent picks per query). */
  private def reachable(g: Hnsw.Graph, start: Int): Set[Int] = {
    val seen = scala.collection.mutable.HashSet(start)
    val stack = scala.collection.mutable.Stack(start)
    while (stack.nonEmpty)
      g.neighbors(stack.pop())(0).foreach(n => if (seen.add(n)) stack.push(n))
    seen.toSet
  }

  // ------------------------------------------------------- generators
  /** Integer-grid coordinates: exact double arithmetic → genuine distance
    * ties between distinct vectors; ~8% zero vectors hit the sentinel
    * (dist = 2.0) path; duplicates arise naturally from the tiny grid. */
  private def genVec(rnd: Random, dim: Int): Array[Float] =
    if (rnd.nextInt(12) == 0) Array.fill(dim)(0.0f)
    else Array.fill(dim)((rnd.nextInt(3) - 1).toFloat)

  test("production beam walk == reference interpreter on random graphs, " +
       "and == brute force over the reachable component at exhaustive ef") {
    val rnd = new Random(0xbea3aa17L)
    (1 to 40).foreach { trial =>
      val n = 1 + rnd.nextInt(100)
      val dim = 3 + rnd.nextInt(5)
      // non-contiguous, shuffled ids: id-order ≠ index-order ≠ insert-order
      val ids = rnd.shuffle((0 until n).map(i => i.toLong * 7 + rnd.nextInt(5) + 1000).distinct.toVector)
      val nodes = ids.map(id => (id, genVec(rnd, dim))).toArray
      val m = Seq(2, 3, 8)(rnd.nextInt(3))
      val efC = Seq(4, 16, 64)(rnd.nextInt(3))
      val g = Hnsw.build(nodes, m, efC)
      val queries = Vector.fill(4)(genVec(rnd, dim)) :+
        nodes(rnd.nextInt(nodes.length))._2 // a query EQUAL to a corpus vector
      queries.zipWithIndex.foreach { case (q, qi) =>
        val comp = reachable(g, refDescend(g, q))
        for (ef <- Seq(1, 2, 5, math.max(1, n / 2), n, 2 * n).distinct) {
          val k = 1 + rnd.nextInt(ef)
          val got = g.search(q, ef, k).toVector
          val ref = refSearch(g, q, ef, k)
          assert(got === ref,
            s"trial=$trial query=$qi n=$n m=$m efC=$efC ef=$ef k=$k:\n" +
              s"production=$got\nreference =$ref")
          if (ef >= nodes.length) {
            // ground truth, no walk involved: exact top-k of the component
            val truth = comp.toVector
              .map(i => (Hnsw.cosineDist(g.vecs(i), q), g.ids(i)))
              .sortBy(t => (t._1, t._2)).take(k).map(_._2)
            assert(got.map(_._1) === truth,
              s"trial=$trial query=$qi exhaustive ef=$ef k=$k: " +
                s"walk=${got.map(_._1)} truth=$truth")
          }
        }
      }
    }
  }
}
