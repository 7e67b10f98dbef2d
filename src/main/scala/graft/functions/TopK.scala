package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a partial-aggregating UDAF — the scale-correct
  * formulation of "top N rows per group".
  *
  * The window-rank formulation (`ROW_NUMBER() OVER (PARTITION BY g ORDER BY
  * v DESC) <= k`) sorts EVERY group member on the reducer: one wide shuffle
  * of the whole fact table plus an O(n log n) sort per group. This
  * aggregator keeps a size-<=k sorted buffer instead, so map-side partial
  * aggregation collapses each input split to k rows per group BEFORE the
  * exchange — the shuffle carries |groups| * k rows regardless of fact
  * size, and no sort ever sees more than k elements. Same contract top-k
  * at 100 TB for the cost of a rollup.
  */
object TopK {

  /** Top-k (value, id) pairs per group by (value desc, id asc) — the
    * deterministic total order (ids unique). Buffer is a descending-sorted
    * array, <= k elements at every step. */
  class TopKByValue(k: Int)
      extends Aggregator[(Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
    require(k > 0, "k must be > 0")

    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Array[(Double, Long)] = Array.empty

    override def reduce(
        buf: Array[(Double, Long)], a: (Double, Long)): Array[(Double, Long)] = {
      if (buf.length == k && !better(a, buf(k - 1))) buf
      else {
        var i = 0
        while (i < buf.length && better(buf(i), a)) i += 1
        val n = math.min(buf.length + 1, k)
        val out = new Array[(Double, Long)](n)
        System.arraycopy(buf, 0, out, 0, i)
        if (i < n) out(i) = a
        if (i + 1 < n) System.arraycopy(buf, i, out, i + 1, n - i - 1)
        out
      }
    }

    override def merge(
        x: Array[(Double, Long)], y: Array[(Double, Long)]): Array[(Double, Long)] = {
      val n = math.min(x.length + y.length, k)
      val out = new Array[(Double, Long)](n)
      var i = 0; var j = 0; var o = 0
      while (o < n) {
        if (j >= y.length || (i < x.length && better(x(i), y(j)))) {
          out(o) = x(i); i += 1
        } else {
          out(o) = y(j); j += 1
        }
        o += 1
      }
      out
    }

    override def finish(b: Array[(Double, Long)]): Array[(Double, Long)] = b
    override def bufferEncoder: Encoder[Array[(Double, Long)]] =
      ExpressionEncoder[Array[(Double, Long)]]()
    override def outputEncoder: Encoder[Array[(Double, Long)]] =
      ExpressionEncoder[Array[(Double, Long)]]()
  }

  /** Column form: `df.groupBy(g).agg(TopK.topKByValue(5, col("v"), col("id")))`
    * — yields an array of (_1 = value, _2 = id) structs, descending. */
  def topKByValue(k: Int, value: Column, id: Column): Column =
    udaf(new TopKByValue(k)).apply(value, id)
}
