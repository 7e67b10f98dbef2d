package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property test of the HNSW graph CONSTRUCTION against a reference
  * interpreter — the build-side complement of [[HnswPropertySpec]] (r11
  * pinned the beam WALK; a build bug previously surfaced only as recall
  * drift at the x256 gate, late and attributed to the wrong layer).
  *
  * The reference side is an independent transcription of Malkov &
  * Yashunin's Algorithm 1 (INSERT: greedy descent above the node's level,
  * then per-level beam search + connect) with Algorithm 3 neighbor
  * selection (SELECT-NEIGHBORS-SIMPLE — the variant the production graph
  * documents; the Algorithm 4 heuristic is intentionally not used there)
  * and the Mmax occupancy prune (closest-cap by the deterministic
  * (distance, id) order, cap = 2M at level 0 / M above). Naive data
  * structures throughout: immutable Vectors re-sorted at every step, no
  * priority queues, its own md5 transcription of the level derivation —
  * nothing shared with the production build except [[Hnsw.cosineDist]],
  * whose arithmetic HnswSpec pins separately.
  *
  * Asserted per random trial, for every node: the level assignment, the
  * entry point and max level, and the per-level neighbor sets — i.e. the
  * ENTIRE persisted adjacency ([[Hnsw.toRows]] content equality up to
  * neighbor order, which prune legitimately permutes). Graph generators
  * reuse the walk spec's adversarial shapes: integer grids for exact
  * distance ties, zero vectors for the sentinel path, duplicated vectors,
  * non-contiguous shuffled ids so id-tiebreaks differ from index order.
  *
  * Seed fixed per the round-gate reproducibility rule (commit 0ce0745). */
class HnswBuildPropertySpec extends AnyFunSuite {

  // ------------------------------------------------- reference builder
  /** Independent md5 → uniform → level transcription (the production
    * derivation lives in [[Hnsw.levelOf]]; re-deriving it here pins the
    * constant and the truncation, not just the graph wiring). */
  private def refLevel(id: Long, m: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"hnsw:$id".getBytes("UTF-8"))
    var bits = 0L
    (0 until 7).foreach(j => bits = (bits << 8) | (d(j) & 0xffL))
    val u = ((bits >>> 4).toDouble + 0.5) / (1L << 52).toDouble
    math.min(16, (-math.log(u) / math.log(m.toDouble)).toInt)
  }

  private final class RefGraph(m: Int, efC: Int) {
    val mMax0 = 2 * m
    var ids = Vector.empty[Long]
    var vecs = Vector.empty[Array[Float]]
    var levels = Vector.empty[Int]
    /** node -> level -> neighbor indexes (insertion order; compared as
      * (dist, id)-sorted lists). */
    var nbrs = Vector.empty[Vector[Vector[Int]]]
    var entry = -1
    var maxLevel = -1

    private def key(q: Array[Float])(i: Int): (Double, Long) =
      (Hnsw.cosineDist(vecs(i), q), ids(i))

    /** Algorithm 2 with naive structures — same transcription shape as the
      * walk spec's refSearchLayer, but over THIS graph's adjacency. */
    private def searchLayer(q: Array[Float], entryPts: Seq[Int], ef: Int,
        level: Int): Vector[Int] = {
      val k = key(q) _
      var visited = Set.empty[Int]
      var cand = Vector.empty[Int]
      var res = Vector.empty[Int]
      entryPts.foreach { p =>
        if (!visited(p)) { visited += p; cand :+= p; res :+= p }
      }
      res = res.sortBy(k).take(ef)
      var done = false
      while (!done && cand.nonEmpty) {
        val c = cand.minBy(k)
        cand = cand.filterNot(_ == c)
        val worst = res.maxBy(k)
        if (k(c)._1 > k(worst)._1 && res.size >= ef) done = true
        else nbrs(c)(level).foreach { n =>
          if (!visited(n)) {
            visited += n
            val w = res.maxBy(k)
            if (res.size < ef || k(n)._1 < k(w)._1 ||
                (k(n)._1 == k(w)._1 && ids(n) < ids(w))) {
              cand :+= n
              res = (res :+ n).sortBy(k).take(ef)
            }
          }
        }
      }
      res.sortBy(k)
    }

    /** Algorithm 1 with Algorithm 3 selection and the Mmax prune. */
    def insert(id: Long, vec: Array[Float]): Unit = {
      val idx = ids.length
      val level = refLevel(id, m)
      ids :+= id; vecs :+= vec; levels :+= level
      nbrs :+= Vector.fill(level + 1)(Vector.empty[Int])
      if (entry < 0) { entry = idx; maxLevel = level; return }
      var ep = entry
      var l = maxLevel
      while (l > level) { // greedy (dist, id) descent, update-in-place
        var changed = true
        while (changed) {
          changed = false
          nbrs(ep)(l).foreach { n =>
            val (dn, dc) = (key(vec)(n), key(vec)(ep))
            if (dn._1 < dc._1 || (dn._1 == dc._1 && dn._2 < dc._2)) {
              ep = n; changed = true
            }
          }
        }
        l -= 1
      }
      var eps: Seq[Int] = Seq(ep)
      l = math.min(level, maxLevel)
      while (l >= 0) {
        val found = searchLayer(vec, eps, efC, l)
        found.take(m).foreach { n => // SELECT-NEIGHBORS-SIMPLE
          nbrs = nbrs.updated(idx, nbrs(idx).updated(l, nbrs(idx)(l) :+ n))
          nbrs = nbrs.updated(n, nbrs(n).updated(l, nbrs(n)(l) :+ idx))
          val cap = if (l == 0) mMax0 else m
          if (nbrs(n)(l).length > cap) { // occupancy prune: keep closest-cap
            val kept = nbrs(n)(l)
              .sortBy(x => (Hnsw.cosineDist(vecs(n), vecs(x)), ids(x)))
              .take(cap)
            nbrs = nbrs.updated(n, nbrs(n).updated(l, kept))
          }
        }
        eps = found
        l -= 1
      }
      if (level > maxLevel) { maxLevel = level; entry = idx }
    }
  }

  // ------------------------------------------------------- generators
  private def genVec(rnd: Random, dim: Int): Array[Float] =
    if (rnd.nextInt(12) == 0) Array.fill(dim)(0.0f)
    else Array.fill(dim)((rnd.nextInt(3) - 1).toFloat)

  test("production build == reference interpreter: levels, entry point " +
       "and full per-level adjacency on random adversarial node sets") {
    val rnd = new Random(0x6e5b111dL)
    (1 to 30).foreach { trial =>
      val n = 1 + rnd.nextInt(90)
      val dim = 3 + rnd.nextInt(5)
      val ids = rnd.shuffle(
        (0 until n).map(i => i.toLong * 7 + rnd.nextInt(5) + 1000).distinct.toVector)
      val nodes = ids.map(id => (id, genVec(rnd, dim))).toArray
      val m = Seq(2, 3, 8)(rnd.nextInt(3))
      val efC = Seq(4, 16, 64)(rnd.nextInt(3))
      val g = Hnsw.build(nodes, m, efC)
      val ref = new RefGraph(m, efC)
      nodes.sortBy(_._1).foreach { case (id, v) => ref.insert(id, v) }
      val ctx = s"trial=$trial n=$n m=$m efC=$efC"
      // same insertion order ⇒ same index space; compare it all
      assert(g.ids.toVector === ref.ids, ctx)
      assert(g.levels.toVector === ref.levels, s"$ctx: level assignment")
      assert(g.maxLevel === ref.maxLevel, ctx)
      assert(g.ids(g.entry) === ref.ids(ref.entry), s"$ctx: entry point")
      (0 until g.ids.length).foreach { i =>
        assert(g.neighbors(i).length === ref.nbrs(i).length, s"$ctx node $i")
        (0 to g.levels(i)).foreach { l =>
          def sorted(xs: Seq[Int], dOf: Int => Double, idOf: Int => Long) =
            xs.map(x => (dOf(x), idOf(x))).sortBy(identity)
          val got = sorted(g.neighbors(i)(l).toSeq,
            x => Hnsw.cosineDist(g.vecs(i), g.vecs(x)), g.ids(_))
          val want = sorted(ref.nbrs(i)(l),
            x => Hnsw.cosineDist(ref.vecs(i), ref.vecs(x)), ref.ids(_))
          assert(got === want, s"$ctx: adjacency of node $i level $l")
        }
      }
    }
  }
}
