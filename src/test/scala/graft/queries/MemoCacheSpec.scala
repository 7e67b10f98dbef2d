package graft.queries

import graft.SparkSpec
import org.apache.spark.storage.StorageLevel

/** The bounded memo store: sweeping more (dataset, config) keys than the
  * cap must evict the least-recently-used entries AND free their
  * cluster-side storage, while results stay bit-identical before/after
  * eviction (an evicted intermediate recomputes; it never changes). */
class MemoCacheSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val sfSmall = "/root/testdata/sf0.001"

  private def withConf[A](key: String, value: String)(body: => A): A = {
    spark.conf.set(key, value)
    try body finally spark.conf.unset(key)
  }

  test("LRU eviction unpersists cached frames; results survive bit-identical") {
    import spark.implicits._
    val baseline = DocQueries.neardupJaccard(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(baseline.nonEmpty)
    // the memoized frame is the shared scored-pair table (neardupJaccard
    // itself is a cheap filter over it and is deliberately NOT cached)
    val pairsDf = DocQueries.scoredPairs(spark, sf)
    assert(pairsDf.storageLevel !== StorageLevel.NONE,
      "memoized pair table must be Spark-cached while resident")
    // sweep more model keys than the cap (default 8) — each distinct
    // vocabCap is a fresh (dataset, cap) entry, pushing the pair table
    // (oldest, never re-accessed) out of the LRU
    val lmBaseline = withConf("spark.graft.lm.vocabCap", "1") {
      DocQueries.unigramLm(spark, sfSmall)
        .as[(Long, Int, Option[Double])].collect().toSet
    }
    (2 to 10).foreach { cap =>
      withConf("spark.graft.lm.vocabCap", cap.toString) {
        DocQueries.unigramLm(spark, sfSmall).queryExecution.toRdd.count()
      }
    }
    assert(MemoCache.size <= 8, s"cache must stay bounded, got ${MemoCache.size}")
    assert(pairsDf.storageLevel === StorageLevel.NONE,
      "evicted entry's cached frame must be unpersisted")
    // recompute after eviction reproduces the original bit-for-bit
    val again = DocQueries.neardupJaccard(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(again === baseline)
    // an evicted BROADCAST entry's old handle also still works (eviction
    // unpersists executor copies; the driver copy re-ships on demand) —
    // the race-safety contract that lets eviction run under live queries
    val lmAgain = withConf("spark.graft.lm.vocabCap", "1") {
      DocQueries.unigramLm(spark, sfSmall)
        .as[(Long, Int, Option[Double])].collect().toSet
    }
    assert(lmAgain === lmBaseline)
  }

  test("unpersistLocalCheckpoint frees the checkpoint RDD's storage") {
    val df = spark.range(100).toDF("x").localCheckpoint()
    val rdds = df.queryExecution.analyzed.collectLeaves().collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    assert(rdds.nonEmpty, "localCheckpoint must plan as a LogicalRDD leaf")
    assert(rdds.exists(_.getStorageLevel !== StorageLevel.NONE))
    MemoCache.unpersistLocalCheckpoint(df)
    assert(rdds.forall(_.getStorageLevel === StorageLevel.NONE))
  }

  test("memo disabled (maxEntries=1, every insert evicts) is results-neutral") {
    import spark.implicits._
    // memo-resident reference: the fuzzy-recall row aggregates two memoized
    // pair tables, the deepest cross-query sharing chain in the suite
    val resident = DocQueries.fuzzyRecall(spark, sf)
      .as[(Long, Long, Option[Double])].collect().toSet
    MemoCache.evict(spark, _ => true)
    // memo effectively OFF: the bound clamps to one slot, so every insert
    // evicts the previous entry — no intermediate survives to be shared
    // across (or even within) queries. Results must be bit-identical: the
    // memo layer is a cost optimization, never a semantic one, and it owns
    // NO storage beyond session-lifetime cluster memory (nothing on disk,
    // nothing across sessions — this is the guardrail against result
    // caching that would survive a fresh run).
    val offline = withConf("spark.graft.memo.maxEntries", "0") {
      DocQueries.fuzzyRecall(spark, sf)
        .as[(Long, Long, Option[Double])].collect().toSet
    }
    assert(offline === resident)
    assert(MemoCache.size <= 1, "maxEntries=0 must clamp the bound to 1")
    MemoCache.evict(spark, _ => true)
  }

  test("memoized values never persist to disk paths (session-only storage)") {
    // Every release action is an unpersist of session-scoped cluster
    // storage; no MemoCache entry writes files. Probe: populate an entry,
    // then assert the session's persistent RDDs are the ONLY storage the
    // memo added, and that they are memory/disk CACHE levels (spill-safe
    // scratch), never an external path. A fresh lookup after evict(_ =>
    // true) must RECOMPUTE (miss), proving nothing was read back from
    // anywhere outside the store.
    DocQueries.neardupJaccard(spark, sf).queryExecution.toRdd.count()
    val (h0, m0) = MemoCache.lookupCounts
    DocQueries.neardupJaccard(spark, sf).queryExecution.toRdd.count()
    val (h1, m1) = MemoCache.lookupCounts
    assert(h1 > h0 && m1 === m0, "second invocation must be a pure memo hit")
    MemoCache.evict(spark, _ => true)
    assert(MemoCache.size === 0)
    DocQueries.neardupJaccard(spark, sf).queryExecution.toRdd.count()
    val (_, m2) = MemoCache.lookupCounts
    assert(m2 > m1, "post-evict invocation must recompute, not read back")
  }

  test("stopped-session sweep and explicit evict drop matching entries") {
    // explicit eviction by key predicate releases and removes the entry
    val key = ("memo-spec-probe", "k1")
    var released = 0
    MemoCache.getOrElseUpdate(spark, key)(42)(_ => released += 1)
    MemoCache.getOrElseUpdate(spark, key)(sys.error("must hit memo"))(_ => ())
    MemoCache.evict(spark, _ == key)
    assert(released === 1, "evict must run the entry's release action")
    // re-insert recomputes
    var computed = false
    MemoCache.getOrElseUpdate(spark, key)({ computed = true; 7 })(_ => ())
    assert(computed)
    MemoCache.evict(spark, _ == key)
  }
}
