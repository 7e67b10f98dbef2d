package graft.streaming

import graft.SparkSpec
import graft.functions.MinHash
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming LSH near-dup: cross-batch bucket state, deterministic
  * within-batch order, and parity with a plain-Scala replay of the same
  * band layout (the batch operators' oracle logic, arrival-ordered). */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val K = 64
  private val BandRows = 8

  /** Arrival-ordered replay: per band bucket, first doc is canonical,
    * later docs emit (doc, canonical, matches/k). */
  private def replay(arrivals: Seq[(Long, String)]): Set[(Long, Long, Double)] = {
    val state = scala.collection.mutable.Map[String, (Long, Array[Long])]()
    val out = scala.collection.mutable.Set[(Long, Long, Double)]()
    arrivals.foreach { case (id, text) =>
      val sig = MinHash.signatureFromText(text, K)
      (0 until K / BandRows).foreach { b =>
        val key = b.toString + ":" + sig.slice(b * BandRows, (b + 1) * BandRows).mkString(",")
        state.get(key) match {
          case None => state(key) = (id, sig)
          case Some((cid, csig)) if cid != id =>
            val m = sig.zip(csig).count { case (a, c) => a == c }
            out += ((id, cid, m.toDouble / K))
          case _ => ()
        }
      }
    }
    out.toSet
  }

  test("cross-batch bucket state flags later near-duplicates against the first-seen canonical") {
    implicit val sqlCtx = spark.sqlContext
    // ~60 tokens so a 3-token append keeps Jaccard ≈ 0.95 — high enough
    // that at least one of the 8 bands provably collides for doc 21
    val base = (1 to 20).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val mut = base + " tail words appended"            // near-dup of base
    val other = "completely different content with no shared shingles at all here today"
    val batch1 = Seq((10L, base), (11L, other))
    val batch2 = Seq((20L, base), (21L, mut), (22L, "unrelated fresh text arriving later with novel tokens only"))

    val input = MemoryStream[(Long, String)]
    val q = Streams.nearDupStream(input.toDS(), K, BandRows)
      .toDF("doc_id", "canonical_doc_id", "est_jaccard")
      .writeStream.format("memory").queryName("neardup").outputMode("append").start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
      val got = spark.table("neardup").as[(Long, Long, Double)].collect().toSet
      val expected = replay(batch1 ++ batch2)
      assert(got === expected)
      // the byte-identical doc 20 collides with 10 in every band at est 1.0
      assert(got.contains((20L, 10L, 1.0)))
      // the near-dup 21 must hit doc 10's buckets (not 20's: 10 is first-seen)
      val hit21 = got.filter(_._1 == 21L)
      assert(hit21.nonEmpty && hit21.forall(_._2 == 10L))
      assert(hit21.forall(_._3 >= 0.3), s"estimate too low: $hit21")
      // unrelated docs never surface
      assert(!got.exists(r => r._1 == 11L || r._1 == 22L))
    } finally q.stop()
  }

  test("state is one entry per bucket: candidates cap at bands per doc and replay deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val text = "one single document repeated many times to stress a single bucket set now"
    val arrivals = (0L until 20L).map(i => (i, text))
    val input = MemoryStream[(Long, String)]
    val q = Streams.nearDupStream(input.toDS(), K, BandRows)
      .toDF("doc_id", "canonical_doc_id", "est_jaccard")
      .writeStream.format("memory").queryName("neardup_cap").outputMode("append").start()
    try {
      input.addData(arrivals: _*); q.processAllAvailable()
      val got = spark.table("neardup_cap").as[(Long, Long, Double)].collect()
      // every non-canonical doc emits exactly `bands` rows, all against doc 0
      assert(got.length === 19 * (K / BandRows))
      assert(got.forall(r => r._2 == 0L && r._3 == 1.0))
      assert(got.toSet === replay(arrivals))
    } finally q.stop()
  }
}
