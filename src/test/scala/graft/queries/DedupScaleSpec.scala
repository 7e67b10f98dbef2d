package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The scale gates of the dedup/LM family: each driver-collect small-data
  * path has a distributed twin behind a size gate, and forcing the gate
  * must reproduce the small-path output bit-for-bit. */
class DedupScaleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val sfSmall = "/root/testdata/sf0.001"

  private def withConf[A](key: String, value: String)(body: => A): A = {
    spark.conf.set(key, value)
    try body finally spark.conf.unset(key)
  }

  test("distributed Jaccard verify matches the broadcast merge-walk bit-for-bit") {
    import spark.implicits._
    val viaBroadcast = DocQueries.neardupJaccard(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    val viaJoin = withConf("spark.graft.dedup.maxBroadcastDocs", "0") {
      DocQueries.neardupJaccardCompute(spark, sf)
        .as[(Long, Long, Long, Double)].collect().toSet
    }
    assert(viaBroadcast.nonEmpty)
    assert(viaJoin === viaBroadcast) // doubles exact: same int-exact division
  }

  test("distributed-components dedupClusters matches the driver union-find") {
    import spark.implicits._
    val viaDriver = DocQueries.dedupClusters(spark, sf)
      .as[(Long, Long, Boolean)].collect().toSet
    val viaComponents = withConf("spark.graft.dedup.maxDriverPairs", "0") {
      DocQueries.dedupClusters(spark, sf)
        .as[(Long, Long, Boolean)].collect().toSet
    }
    assert(viaDriver.exists(_._3)) // the fixture does contain duplicates
    assert(viaComponents === viaDriver)
  }

  test("unigram-LM vocab cap binds: off-model tokens score at the OOV floor") {
    import spark.implicits._
    val full = DocQueries.unigramLm(spark, sfSmall)
      .as[(Long, Int, Option[Double])].collect().toMap2
    val capped = withConf("spark.graft.lm.vocabCap", "2") {
      DocQueries.unigramLm(spark, sfSmall)
        .as[(Long, Int, Option[Double])].collect().toMap2
    }
    assert(capped.keySet === full.keySet)
    assert(capped != full) // the cap actually bound (vocab >> 2)
    // independent reference: rebuild the capped model in the test and fold
    val docs = spark.read.parquet(s"$sfSmall/documents.parquet")
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("tk"))
      .as[(Long, Seq[String])].collect()
    val counts = docs.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length.toLong }
    val lnTotal = math.log(counts.values.sum.toDouble)
    val top2 = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(2).toMap
    docs.foreach { case (id, tk) =>
      var s = 0.0
      var i = 0
      while (i < tk.length) {
        s += math.log(top2.getOrElse(tk(i), 1L).toDouble); i += 1
      }
      val expect = BigDecimal(lnTotal - s / tk.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(capped(id)._2.contains(expect), s"doc $id")
    }
  }

  test("importance vocab cap binds and keeps schema/rows") {
    import spark.implicits._
    val full = DocQueries.importance(spark, sfSmall)
      .as[(Long, Int, Option[Double])].collect().toSet
    val capped = withConf("spark.graft.lm.vocabCap", "2") {
      DocQueries.importance(spark, sfSmall)
        .as[(Long, Int, Option[Double])].collect().toSet
    }
    val big = withConf("spark.graft.lm.vocabCap", Int.MaxValue.toString) {
      DocQueries.importance(spark, sfSmall)
        .as[(Long, Int, Option[Double])].collect().toSet
    }
    assert(capped.map(_._1) === full.map(_._1))
    assert(capped != full)  // binding cap changes scores
    assert(big === full)     // non-binding cap is a no-op
  }

  test("blocked cosine near-dup matches the exact all-pairs baseline bit-for-bit") {
    import spark.implicits._
    val baseline = EmbeddingQueries.neardupCosine(spark, sfSmall)
      .as[(Long, Long, Double)].collect().toSet
    val blocked = EmbeddingQueries.neardupCosineBlocked(spark, sfSmall, nBlocks = 7)
      .as[(Long, Long, Double)].collect().toSet
    assert(baseline.nonEmpty)
    assert(blocked === baseline)
  }

  test("neardupCosine size gate routes the oracled entry through the blocked path") {
    import spark.implicits._
    val baseline = EmbeddingQueries.neardupCosine(spark, sfSmall)
      .as[(Long, Long, Double)].collect().toSet
    // a 100-doc budget forces nBlocks = ceil(corpus/100) > 1 on the SAME
    // public entry point the oracle runs — not just the private blocked fn
    val gated = withConf("spark.graft.dedup.maxBroadcastDocs", "100") {
      EmbeddingQueries.neardupCosine(spark, sfSmall)
        .as[(Long, Long, Double)].collect().toSet
    }
    assert(baseline.nonEmpty)
    assert(gated === baseline)
  }

  test("linear probe: distributed GD path matches the driver loop bit-for-bit") {
    import spark.implicits._
    val viaDriver = EmbeddingQueries.linearProbe(spark, sfSmall)
      .as[(Long, Int, Double, Boolean)].collect().toSet
    val viaDistributed = withConf("spark.graft.probe.maxDriverRows", "0") {
      EmbeddingQueries.linearProbe(spark, sfSmall)
        .as[(Long, Int, Double, Boolean)].collect().toSet
    }
    assert(viaDriver.nonEmpty)
    assert(viaDriver.exists(_._4), "the probe must predict some positives")
    assert(viaDistributed === viaDriver)
  }

  test("bloom decontamination: no false negatives vs the exact path, FP rate bounded") {
    import spark.implicits._
    // planted contamination: every 10th train fingerprint also sits in bench
    val train = (0L until 5000L).map(i => (i, s"fp-train-$i-${i % 10 == 0}"))
      .toDF("doc_id", "fingerprint")
    val bench = (0L until 5000L by 10L).map(i => (i, s"fp-train-$i-true"))
      .toDF("doc_id", "fingerprint")
      .union(Seq((99999L, "fp-bench-only")).toDF("doc_id", "fingerprint"))
    val exact = DocQueries.flagContaminated(train, bench, "fingerprint")
      .select(col("doc_id"), col("contaminated"))
      .as[(Long, Boolean)].collect().toMap
    val bloom = DocQueries.flagContaminatedBloom(train, bench, "fingerprint", 0.01)
      .select(col("doc_id"), col("maybe_contaminated"))
      .as[(Long, Boolean)].collect().toMap
    assert(bloom.keySet === exact.keySet)
    val contaminated = exact.filter(_._2).keySet
    assert(contaminated.size === 500)
    assert(contaminated.forall(bloom(_))) // Bloom cannot miss
    // false positives stay near the configured fpp (generous 5x headroom)
    val clean = exact.filterNot(_._2).keySet
    val fps = clean.count(bloom(_))
    assert(fps.toDouble / clean.size <= 0.05,
      s"$fps false positives over ${clean.size} clean rows")
    // and the query-level wrapper runs over the real table (all-false
    // there: the corpus has no cross-slice exact dupes)
    val real = DocQueries.decontaminateBloom(spark, sf)
    assert(real.columns.contains("maybe_contaminated") && real.count() > 0)
  }

  test("semDedupKmeans: k-means cells partition the corpus and flag true near-dups") {
    import spark.implicits._
    val out = EmbeddingQueries.semDedupKmeans(spark, sfSmall).cache()
    val n = spark.read.parquet(s"$sfSmall/embeddings.parquet").count()
    assert(out.count() === n)           // every vector labeled exactly once
    assert(out.select("cell").distinct().count() > 1) // real partitioning
    // keep-first policy: a duplicate always points at a smaller vec_id
    assert(out.filter(col("is_dup") && col("dup_of") >= col("vec_id")).isEmpty)
    // every flagged pair is a genuine >= threshold cosine pair (checked
    // against the raw embeddings with the same scaled-integer arithmetic)
    val emb = spark.read.parquet(s"$sfSmall/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap.view.mapValues(
        _.map(x => math.floor(x.toDouble * 10000000).toLong).toArray).toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val flagged = out.filter(col("is_dup"))
      .select("vec_id", "dup_of").as[(Long, Long)].collect()
    assert(flagged.nonEmpty)
    flagged.foreach { case (v, d) =>
      val c = BigDecimal(cos(emb(v), emb(d)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(c >= 0.4, s"flagged pair ($v,$d) has cosine $c < 0.4")
    }
    out.unpersist()
  }

  test("semDedup routes to k-means cells past the label-cell gate") {
    import spark.implicits._
    // forcing the gate on the oracled entry itself must reproduce the
    // direct k-means-cell call exactly (same cells, same flags)
    val gated = withConf("spark.graft.dedup.maxLabelCellVecs", "0") {
      EmbeddingQueries.semDedup(spark, sfSmall)
        .as[(Long, Long, Boolean, Option[Long])].collect().toSet
    }
    val direct = EmbeddingQueries.semDedupKmeans(spark, sfSmall)
      .as[(Long, Long, Boolean, Option[Long])].collect().toSet
    assert(gated === direct)
    // flag semantics survive the reroute: keep-first means every duplicate
    // points at a strictly smaller vec_id, non-dups carry no pointer
    gated.foreach { case (v, _, isDup, dupOf) =>
      if (isDup) assert(dupOf.exists(_ < v)) else assert(dupOf.isEmpty)
    }
  }

  private implicit class Tuple3Map[A, B, C](xs: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = xs.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
