package graft.queries

import graft.{PlantedFuzzy, SparkSpec}

/** The planted-truth fuzzy-recall harness, pinned at a scale where the
  * exact join IS computable — so the plant protocol itself is validated
  * before its x256 measurement is trusted:
  *
  *  - generator invariants: determinism, exact substitution count,
  *    whitespace/length preservation, distance within [1, e];
  *  - plant truth ⊆ true pairs: the provably complete exact operator finds
  *    EVERY planted pair (twin construction survives the band keys, the
  *    length residual and the verify end-to-end);
  *  - [[PlantedFuzzy.measure]]'s per-bucket counts equal an independent
  *    plants ∩ blocked-output join. */
class FuzzyPlantSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("perturb: deterministic, exact substitution count, whitespace and " +
       "length preserved, distance within [1, e], clustered edits contiguous") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val eligible = text.indices.filter(i => !text(i).isWhitespace)
    for (e <- PlantedFuzzy.EditBuckets; clustered <- Seq(false, true)) {
      val p = PlantedFuzzy.perturb(text, e, 42L, clustered)
      assert(p === PlantedFuzzy.perturb(text, e, 42L, clustered),
        "not deterministic")
      assert(p.length === text.length)
      val diffs = text.indices.filter(i => text(i) != p(i))
      assert(diffs.length === math.min(e, eligible.length),
        s"e=$e clustered=$clustered planted ${diffs.length} substitutions")
      text.indices.foreach { i =>
        if (text(i).isWhitespace)
          assert(p(i) === text(i), s"whitespace clobbered at $i")
      }
      if (clustered && e < eligible.length) {
        // edited positions form one contiguous run (with wrap) in
        // eligible-position order: some start s covers them exactly
        val idx = diffs.map(eligible.indexOf).toSet
        val run = (0 until eligible.length).exists(s =>
          (0 until idx.size).map(i => (s + i) % eligible.length).toSet == idx)
        assert(run, s"e=$e clustered edits not one contiguous run: $idx")
      }
      val d = graft.functions.ThresholdLevenshtein.distanceChars(text, p, 40)
      assert(d >= 1 && d <= e, s"e=$e clustered=$clustered measured dist $d")
    }
    // different ids perturb differently — the twin population is diverse
    assert(PlantedFuzzy.perturb(text, 4, 1L) !==
      PlantedFuzzy.perturb(text, 4, 2L))
    // an edit budget beyond the eligible positions saturates cleanly
    val tiny = PlantedFuzzy.perturb("ab c", 40, 7L)
    assert(tiny.length === 4)
    assert(tiny(2) === ' ')
    assert(tiny !== "ab c")
  }

  test("planted fixture: exact operator finds every planted pair; " +
       "measure() matches an independent plants-blocked intersection") {
    val out = java.nio.file.Files.createTempDirectory("graft-plant").toString
    PlantedFuzzy.plantDocuments(spark, sf, out, everyN = 4L)
    val plants = spark.read.parquet(s"$out/plants.parquet")
      .select("doc_a", "doc_b", "e", "mode", "dist")
      .as[(Long, Long, Int, String, Long)].collect()
    assert(plants.nonEmpty)
    assert(plants.map(_._4).toSet === Set("scattered", "clustered"))
    plants.foreach { case (a, b, e, _, d) =>
      assert(d >= 1 && d <= e, s"pair ($a,$b): dist $d outside [1, $e]")
    }
    // plant truth ⊆ true pairs — if the exact (provably complete) operator
    // misses a planted pair, the plant itself is broken
    val exact = DocQueries.fuzzyDedup(spark, out)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    plants.foreach { case (a, b, e, m, _) =>
      assert(exact((a, b)), s"exact operator missed planted pair ($a,$b) e=$e $m")
    }
    // per-bucket counts of measure() == independent intersection
    val blocked = DocQueries.fuzzyDedupBlocked(spark, out)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val rows = PlantedFuzzy.measure(spark, out).collect()
    val byKey = plants.groupBy(t => (t._3, t._4))
    rows.foreach { r =>
      val key = (r.getAs[Int]("e"), r.getAs[String]("mode"))
      val bucket = byKey(key)
      assert(r.getAs[Long]("n_planted") === bucket.length.toLong, s"$key planted")
      assert(r.getAs[Long]("n_found") ===
        bucket.count(t => blocked((t._1, t._2))).toLong, s"$key found")
    }
    assert(rows.map(r => (r.getAs[Int]("e"), r.getAs[String]("mode"))).toSet
      === byKey.keySet)
  }

  test("scattered-edit pigeonhole: gear block keys survive scattered " +
       "substitutions that destroy the shingle bands") {
    // deterministic (md5-driven perturb, fixed corpus): over every sf0.001
    // document, a scattered e-substitution twin must share >= 1 blocking
    // chunk key with its source at high rate — the signal fuzzyCandCdc
    // joins on, and exactly where the r11 probe measured shingle-LSH at
    // 0.32 (e4) / 0.07 (e8)
    import org.apache.spark.unsafe.types.UTF8String
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(docs.length >= 40)
    for ((e, minFrac) <- Seq(4 -> 0.85, 8 -> 0.7)) {
      val hits = docs.count { case (id, text) =>
        val twin = PlantedFuzzy.perturb(text, e, id, clustered = false)
        val a = graft.functions.GearChunker
          .blockKeys(UTF8String.fromString(text)).toSet
        graft.functions.GearChunker
          .blockKeys(UTF8String.fromString(twin)).exists(a)
      }
      assert(hits >= (docs.length * minFrac).toInt,
        s"e=$e scattered: only $hits/${docs.length} twins share a chunk key")
    }
  }

  test("fuzzyBlockedDiag: union bounded by the parts, cap follows the " +
       "corpus-scaled formula") {
    val r = DocQueries.fuzzyBlockedDiag(spark, sf).head()
    val (lsh, cdc, uni) = (r.getAs[Long]("lsh_pairs"),
      r.getAs[Long]("cdc_pairs"), r.getAs[Long]("union_pairs"))
    assert(uni >= math.max(lsh, cdc) && uni <= lsh + cdc)
    val n = graft.Tables.documents(spark, sf).count()
    assert(r.getAs[Long]("cdc_cap") === math.max(64L, n / 1024L))
    assert(r.getAs[Long]("hot_keys_dropped") >= 0L)
  }
}
