package graft.queries

import graft.SparkSpec
import graft.functions.TopK
import org.apache.spark.sql.functions._

/** Contract tests for the aggregation-shaped rank/sample operators: the
  * partial-aggregating top-k, the CDF exact quantiles, the A-ES weighted
  * reservoir, and the prefix-filtered Jaro-Winkler phrase linkage. Each is
  * checked against an in-memory reference computed by a DIFFERENT
  * formulation (sort, brute force) on the same data. */
class RankSampleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("topkAgg equals the sort-based formulation") {
    import spark.implicits._
    val rows = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"))
      .as[(String, Long, Double)].collect()
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex
        .map { case ((_, id, v), i) => (t, i + 1, id, v) }
    }.toSet
    val got = EventQueries.queries("evt_topk_agg")(spark, sf)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("TopK aggregator merge is order-insensitive and bounded") {
    val agg = new TopK.TopKByValue(3)
    val rnd = new scala.util.Random(11)
    val data = Array.tabulate(200)(i => (rnd.nextInt(20).toDouble, i.toLong))
    val expected = data.sortBy(r => (-r._1, r._2)).take(3).toSeq
    // fold in two different split orders, then merge
    for (cut <- Seq(1, 57, 199)) {
      val (l, r) = data.splitAt(cut)
      val bl = l.foldLeft(agg.zero)(agg.reduce)
      val br = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(bl, br).toSeq === expected)
      assert(agg.merge(br, bl).toSeq === expected)
      assert(agg.merge(bl, br).length <= 3)
    }
  }

  test("exactQuantiles equals the rank-on-sorted definition per group") {
    import spark.implicits._
    val rows = graft.Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).as[(String, Double)].collect()
    def q(vs: Array[Double], p: Double): Double = {
      val s = vs.sorted
      s(math.ceil(p * s.length).toInt - 1)
    }
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      val vs = rs.map(_._2)
      (t, q(vs, 0.25), q(vs, 0.5), q(vs, 0.75), q(vs, 0.9), q(vs, 0.99))
    }.toSet
    val got = EventQueries.queries("evt_exact_quantiles")(spark, sf)
      .as[(String, Double, Double, Double, Double, Double)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("weightedSample: deterministic, and keys monotone in the draw") {
    import spark.implicits._
    val a = DocQueries.weightedSample(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val b = DocQueries.weightedSample(spark, sf)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(a === b, "A-ES selection must be reproducible")
    assert(a.size === 100)
    // ranks are 1..100 aligned with ascending sel_key
    assert(a.sortBy(_._4).map(_._3) === a.map(_._3).sorted)
    // recomputing a doc's key from scratch matches the emitted key
    val (docId, nChars, key, _) = a.head
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"res:$docId".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 13)
    val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
    assert(math.abs(-math.log(u) / nChars - key) < 1e-12)
  }

  test("vocabLink: prefix-filtered output equals brute force over the vocabulary") {
    import spark.implicits._
    val got = DocQueries.vocabLink(spark, sf)
      .as[(String, String, Double)].collect().toSet
    // brute-force reference over the same deterministic vocabulary
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(udf((t: String) =>
        if (t == null) Array.empty[String]
        else graft.functions.MinHash.ngrams(t.toLowerCase, 3)).apply(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z ]{6,}$"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(1500)
      .as[(String, Long)].collect().map(_._1)
    val brute = (for {
      i <- vocab.indices; j <- vocab.indices if vocab(i) < vocab(j)
      s = graft.functions.JaroWinkler.similarity(
        org.apache.spark.unsafe.types.UTF8String.fromString(vocab(i)),
        org.apache.spark.unsafe.types.UTF8String.fromString(vocab(j)))
      if s > 0.9399999990
    } yield (vocab(i), vocab(j), s)).toSet
    assert(got === brute, "prefix filter must be COMPLETE, not just precise")
    assert(got.nonEmpty)
  }

  test("typoPairs: 4-symbol prefix block equals brute force over the vocabulary") {
    import spark.implicits._
    val got = DocQueries.typoPairs(spark, sf)
      .as[(String, String, Int)].collect().toSet
    val vocab = graft.Tables.documents(spark, sf)
      .select(explode(udf((t: String) =>
        if (t == null) Array.empty[String]
        else graft.functions.MinHash.ngrams(t.toLowerCase, 3)).apply(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z ]{6,}$"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(1500)
      .as[(String, Long)].collect().map(_._1)
    val brute = (for {
      i <- vocab.indices; j <- vocab.indices if vocab(i) < vocab(j)
      dist = graft.functions.DamerauLev.dist(
        vocab(i).getBytes("UTF-8"), vocab(j).getBytes("UTF-8"))
      if dist <= 2
    } yield (vocab(i), vocab(j), dist)).toSet
    assert(got === brute, "blocking must be COMPLETE for DL <= 2")
    assert(got.nonEmpty)
  }

  test("mmrSelect equals brute-force sequential greedy MMR") {
    import spark.implicits._
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => (id, e.map(x => math.floor(x.toDouble * 1e7).toLong)) }
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val q = vecs.find(_._1 == 0L).get._2
    var cand = vecs.filter(_._1 >= 10L)
      .map { case (id, e) => (id, e, dot(e, q)) }.toVector
    var sel = Vector.empty[(Int, Long, Long, Long)]
    var selE = Vector.empty[Array[Long]]
    for (r <- 1 to 10) {
      val pick = cand.map { case (id, e, sq) =>
        val red = if (selE.isEmpty) 0L else selE.map(dot(e, _)).max
        (id, e, sq, sq - red)
      }.minBy { case (id, _, _, sc) => (-sc, id) }
      sel :+= ((r, pick._1, pick._3, pick._4))
      selE :+= pick._2
      cand = cand.filterNot(_._1 == pick._1)
    }
    val got = EmbeddingQueries.queries("emb_mmr_select")(spark, sf)
      .as[(Int, Long, Long, Long)].collect().toVector.sortBy(_._1)
    assert(got === sel)
    // diversity sanity: greedy MMR must deviate from plain MIPS top-10
    val mips = vecs.filter(_._1 >= 10L).map { case (id, e) => (id, dot(e, q)) }
      .sortBy { case (id, sq) => (-sq, id) }.take(10).map(_._1).toSet
    assert(sel.map(_._2).toSet !== mips, "MMR should reorder vs pure relevance")
  }
}
