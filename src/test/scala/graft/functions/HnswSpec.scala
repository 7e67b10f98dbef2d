package graft.functions

import graft.SparkSpec

/** HNSW: graph invariants (degree caps, level monotonicity, reachability),
  * determinism, exhaustive-equivalence at tiny scale, recall at spec
  * parameters, and the sharded Spark path. */
class HnswSpec extends SparkSpec {

  // deterministic pseudo-vectors: md5-derived coordinates
  private def vec(id: Long, dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { j =>
      md.reset()
      val d = md.digest(s"v:$id:$j".getBytes("UTF-8"))
      (((d(0) & 0xff) << 8 | (d(1) & 0xff)).toFloat / 65535.0f) - 0.5f
    }
  }

  private def bruteTopK(corpus: Array[(Long, Array[Float])], q: Array[Float],
      k: Int): Seq[Long] =
    corpus.map { case (id, v) => (Hnsw.cosineDist(v, q), id) }
      .sortBy(t => (t._1, t._2)).take(k).map(_._2).toSeq

  private val corpus = Array.tabulate(400)(i => ((i + 100).toLong, vec(i + 100, 32)))
  private val queries = Array.tabulate(8)(i => vec(i, 32))

  test("graph invariants: degree caps, levels, every node reachable") {
    val g = Hnsw.build(corpus, m = 8, efConstruction = 64)
    assert(g.ids.length === corpus.length)
    for (i <- g.neighbors.indices; l <- g.neighbors(i).indices) {
      val cap = if (l == 0) 16 else 8
      assert(g.neighbors(i)(l).length <= cap, s"node $i level $l over cap")
      // symmetric-ish sanity: neighbors exist at that level
      g.neighbors(i)(l).foreach(n => assert(g.levels(n) >= l))
    }
    // reachability: BFS over level 0 from the entry reaches every node
    val seen = scala.collection.mutable.HashSet(g.entry)
    val stack = scala.collection.mutable.Stack(g.entry)
    while (stack.nonEmpty) {
      val c = stack.pop()
      g.neighbors(c)(0).foreach(n => if (seen.add(n)) stack.push(n))
    }
    assert(seen.size === corpus.length, s"only ${seen.size}/${corpus.length} reachable")
  }

  test("deterministic: two builds give identical graphs and results") {
    val g1 = Hnsw.build(corpus, 8, 64)
    val g2 = Hnsw.build(scala.util.Random.shuffle(corpus.toSeq).toArray, 8, 64)
    assert(g1.entry === g2.entry && g1.maxLevel === g2.maxLevel)
    for (q <- queries)
      assert(g1.search(q, 64, 5).toSeq === g2.search(q, 64, 5).toSeq)
  }

  test("high-ef search is exact on a small graph") {
    val small = corpus.take(60)
    val g = Hnsw.build(small, 8, 64)
    for (q <- queries)
      assert(g.search(q, 64, 5).map(_._1).toSeq === bruteTopK(small, q, 5))
  }

  test("recall at spec parameters on the full corpus") {
    val g = Hnsw.build(corpus, 8, 64)
    var hits = 0
    for (q <- queries) {
      val truth = bruteTopK(corpus, q, 5).toSet
      hits += g.search(q, 64, 5).count(t => truth(t._1))
    }
    val recall = hits.toDouble / (queries.length * 5)
    assert(recall >= 0.95, s"recall $recall")
  }

  test("persistence round-trip: a reloaded graph searches bit-identically") {
    val g = Hnsw.build(corpus, 8, 64)
    val rows = Hnsw.toRows(g)
    // shuffle rows — a parquet read-back has no order guarantee
    val g2 = Hnsw.fromRows(scala.util.Random.shuffle(rows.toSeq).toArray, 8, 64)
    assert(g2.entry === g.entry && g2.maxLevel === g.maxLevel)
    assert(g2.ids.toSeq === g.ids.toSeq)
    for (i <- g.neighbors.indices; l <- g.neighbors(i).indices)
      assert(g2.neighbors(i)(l).toSeq === g.neighbors(i)(l).toSeq, s"node $i level $l")
    for (q <- queries)
      assert(g2.search(q, 64, 5).toSeq === g.search(q, 64, 5).toSeq)
  }

  test("sharded Spark path: recall gate green and deterministic rows") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.queries.EmbeddingQueries.hnswRecall(spark, sf).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Boolean]("ok"), r(0).toString)
    val rows1 = graft.queries.EmbeddingQueries.hnswSearch(spark, sf)
      .collect().map(_.toString).sorted
    val rows2 = graft.queries.EmbeddingQueries.hnswSearch(spark, sf)
      .collect().map(_.toString).sorted
    assert(rows1 === rows2)
    assert(rows1.nonEmpty)
  }
}
