package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t-digest: compression bound, weight conservation, sorted-centroid
  * invariant, rank accuracy on known distributions, merge ≈ whole, and the
  * distributed two-level rollup path. */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  // deterministic uniforms: md5-derived, no RNG
  private def uniforms(n: Int, tag: String): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(n) { i =>
      md.reset()
      val d = md.digest(s"$tag:$i".getBytes("UTF-8"))
      val bits = (0 until 7).foldLeft(0L)((a, j) => (a << 8) | (d(j) & 0xffL)) >>> 4
      (bits.toDouble + 0.5) / (1L << 52).toDouble
    }
  }

  private def digestOf(xs: Array[Double], delta: Double = 200.0): Array[Double] = {
    val flat = new Array[Double](2 * xs.length)
    for (i <- xs.indices) { flat(2 * i) = xs(i); flat(2 * i + 1) = 1.0 }
    TDigest.compress(flat, xs.length, delta)
  }

  private def exactRank(xs: Array[Double], v: Double): Double =
    xs.count(_ <= v).toDouble / xs.length

  test("compress conserves weight, sorts centroids, respects the size bound") {
    val xs = uniforms(50000, "w")
    val dig = digestOf(xs)
    assert(math.abs(TDigest.weight(dig) - xs.length) < 1e-6)
    val means = dig.indices.collect { case i if i % 2 == 0 => dig(i) }
    assert(means === means.sorted)
    assert(dig.length / 2 <= 3 * 200, s"${dig.length / 2} centroids")
    assert(dig.length / 2 >= 100, "suspiciously few centroids")
  }

  test("rank accuracy on uniform and heavy-tailed data") {
    val uni = uniforms(50000, "u")
    val exp = uniforms(50000, "e").map(u => -math.log(u)) // exponential tail
    for (xs <- Seq(uni, exp); q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99, 0.999)) {
      val est = TDigest.quantile(digestOf(xs), q)
      val err = math.abs(exactRank(xs, est) - q)
      // tails must be TIGHTER than the middle — the t-digest property
      val bound = if (q <= 0.01 || q >= 0.99) 0.002 else 0.01
      assert(err <= bound, s"q=$q err=$err")
    }
  }

  test("merging per-shard digests matches digesting the whole within bound") {
    val xs = uniforms(40000, "m")
    val whole = digestOf(xs)
    val shards = xs.grouped(10000).map(g => digestOf(g)).toSeq
    val flat = shards.flatten.toArray
    val merged = TDigest.compress(flat, flat.length / 2, 200.0)
    assert(math.abs(TDigest.weight(merged) - xs.length) < 1e-6)
    for (q <- Seq(0.05, 0.5, 0.95, 0.99)) {
      val a = TDigest.quantile(whole, q)
      val b = TDigest.quantile(merged, q)
      assert(math.abs(exactRank(xs, a) - exactRank(xs, b)) <= 0.01, s"q=$q")
    }
  }

  test("degenerate inputs: empty, singleton, constant column") {
    assert(TDigest.quantile(Array.emptyDoubleArray, 0.5).isNaN)
    assert(TDigest.quantile(digestOf(Array(7.5)), 0.99) === 7.5)
    val const = digestOf(Array.fill(1000)(3.0))
    assert(TDigest.quantile(const, 0.01) === 3.0)
    assert(TDigest.quantile(const, 0.99) === 3.0)
  }

  test("distributed two-level rollup agrees with the local digest") {
    val xs = uniforms(20000, "d")
    val df = xs.zipWithIndex.toSeq
      .toDF("v", "i")
      .withColumn("shard", col("i") % 7)
      .repartition(8)
    val daily = df.groupBy("shard").agg(TDigest.tdigest(col("v")).as("dig"))
    val global = daily.agg(TDigest.tdigestMerge(col("dig")).as("dig"))
      .select(
        GraftFunctions.tdigestQuantile(col("dig"), 0.5).as("p50"),
        GraftFunctions.tdigestQuantile(col("dig"), 0.99).as("p99"),
        size(col("dig")).as("len"))
      .head()
    assert(math.abs(exactRank(xs, global.getDouble(0)) - 0.5) <= 0.01)
    assert(math.abs(exactRank(xs, global.getDouble(1)) - 0.99) <= 0.005)
    assert(global.getInt(2) / 2 <= 3 * 200)
  }
}
