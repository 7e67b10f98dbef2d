package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Cross-batch streaming t-digest: after every micro-batch, each group's
  * emitted count is EXACT over everything seen so far, and every emitted
  * quantile's rank error against the exact CDF of everything seen so far
  * stays within the batch gate's bound (the digest is batching-sensitive,
  * so bit-parity is the wrong contract — rank bounds are the sketch's). */
class TDigestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def uniforms(n: Int, tag: String): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(n) { i =>
      md.reset()
      val d = md.digest(s"$tag:$i".getBytes("UTF-8"))
      val bits = (0 until 7).foldLeft(0L)((a, j) => (a << 8) | (d(j) & 0xffL)) >>> 4
      (bits.toDouble + 0.5) / (1L << 52).toDouble
    }
  }

  test("per-batch emissions: exact counts, rank-bounded quantiles") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = uniforms(3000, "a").map(("click", _)) ++
      uniforms(500, "b").map(("view", _))
    val b2 = uniforms(3000, "c").map(v => ("click", v * 10.0)) // shifted regime
    val input = MemoryStream[(String, Double)]
    val q = Streams.tdigestStream(
        input.toDS().toDF("event_type", "value"), qs = Seq(0.5, 0.95))
      .writeStream.format("memory").queryName("td").outputMode("update").start()
    try {
      def latest(): Map[(String, Double), (Long, Double)] =
        spark.table("td").as[(String, Long, Double, Double)].collect()
          .groupBy(r => (r._1, r._3))
          // update mode re-emits per batch; the max-n row is the latest
          .map { case (k, rs) => k -> { val m = rs.maxBy(_._2); (m._2, m._4) } }

      def rankErr(seen: Seq[Double], est: Double, q: Double): Double =
        math.abs(seen.count(_ <= est).toDouble / seen.length - q)

      input.addData(b1: _*); q.processAllAvailable()
      val after1 = latest()
      assert(after1(("click", 0.5))._1 === 3000L)
      assert(after1(("view", 0.95))._1 === 500L)
      val clicks1 = b1.collect { case ("click", v) => v }
      assert(rankErr(clicks1, after1(("click", 0.5))._2, 0.5) <= 0.02)
      assert(rankErr(clicks1, after1(("click", 0.95))._2, 0.95) <= 0.02)

      input.addData(b2: _*); q.processAllAvailable()
      val after2 = latest()
      assert(after2(("click", 0.5))._1 === 6000L) // exact cross-batch count
      val clicksAll = clicks1 ++ b2.map(_._2)
      // the shifted second regime moves p95 into the new mass; the digest
      // must track the UNION's CDF, not the last batch's
      assert(rankErr(clicksAll, after2(("click", 0.5))._2, 0.5) <= 0.02)
      assert(rankErr(clicksAll, after2(("click", 0.95))._2, 0.95) <= 0.02)
      // untouched group unchanged
      assert(after2(("view", 0.5))._1 === 500L)
    } finally q.stop()
  }
}
