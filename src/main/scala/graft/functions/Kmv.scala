package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared KMV (k-minimum-values) distinct-sketch primitives — ONE hash and
  * ONE estimator used by both the batch `EventQueries.kmvOverlap` and the
  * streaming `Streams.kmvDistinctStream`, so the documented "a streaming
  * estimate equals the batch estimate over the same keys" parity holds by
  * construction instead of by keeping two inline copies manually in sync.
  */
object Kmv {

  /** Hash range: 15 hex chars = 60 bits, so `Scale` = 2^60. */
  val Scale = 1152921504606846976L

  /** 60-bit uniform key hash — the oracle-replicable md5 recipe (DuckDB:
    * `('0x' || substr(md5(k), 1, 15))::UBIGINT`). */
  def hash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Column-side KMV estimator over a sorted sketch with `cnt` kept
    * values: exact below capacity `k`, `(k-1)·2^60 / h_k` at capacity. */
  def estimate(k: Int, sketch: Column, cnt: Column): Column =
    when(cnt < k, cnt.cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(Scale.toDouble) /
        element_at(sketch, k).cast("double"))

  /** JVM-side estimator twin for streaming state folds — the same
    * arithmetic over a sorted ascending array of kept hashes. */
  def estimateArr(k: Int, merged: Array[Long]): Double =
    if (merged.length < k) merged.length.toDouble
    else (k - 1).toDouble * Scale.toDouble / merged(k - 1)
}
