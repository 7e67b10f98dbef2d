package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable fixed-bin histogram quantile as a typed [[Aggregator]] — the
  * custom-aggregate form of the histogram sketch in
  * `EventQueries.rollingP95` (same bin = scaled value >> [[BinShift]],
  * same integer rank rule `cum x 20 >= n x 19`, so the two formulations
  * agree exactly; asserted in SketchSpec).
  *
  * Unlike a value sample, bin counts merge associatively/commutatively
  * with NO error growth — the property that lets one daily histogram pass
  * answer any sliding-window percentile at 100 TB. State per group is the
  * live-bin map (bounded by the value range / bin width, not by count).
  *
  * Usable anywhere a Column aggregate is, including streaming windowed
  * aggregations: `ds.groupBy(...).agg(Histogram.p95Floor(col))`.
  */
object Histogram {

  /** Bin width = 2^12 scaled-value units (4.096 raw units). */
  final val BinShift = 12

  /** The p95 lower bin edge (scaled units) from exact bin counts: the
    * smallest bin whose cumulative count reaches 95% (cum x 20 >= n x 19,
    * the integer form — no float thresholds anywhere). */
  private[functions] def p95FloorOf(bins: Map[Long, Long]): Long = {
    val n = bins.valuesIterator.sum
    var cum = 0L
    for ((bin, cnt) <- bins.toSeq.sortBy(_._1)) {
      cum += cnt
      if (cum * 20 >= n * 19) return bin << BinShift
    }
    0L
  }

  /** Typed aggregator over the SCALED long value (floor(value x 1000),
    * like the SQL side). */
  class P95Floor extends Aggregator[Long, Map[Long, Long], Long] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(b: Map[Long, Long], v: Long): Map[Long, Long] = {
      val bin = v >> BinShift // arithmetic: negatives bin below zero
      b.updated(bin, b.getOrElse(bin, 0L) + 1L)
    }
    override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
      y.foldLeft(x) { case (acc, (bin, cnt)) =>
        acc.updated(bin, acc.getOrElse(bin, 0L) + cnt)
      }
    override def finish(b: Map[Long, Long]): Long = p95FloorOf(b)
    override def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column-API form over the scaled value:
    * `df.groupBy(...).agg(Histogram.p95Floor(col("value_scaled")))`. */
  def p95Floor(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udaf(new P95Floor).apply(c.cast("long"))
}
