package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData

/** Scaled-integer embedding math (see EmbeddingQueries for the parity
  * contract: float→double is an exact widening, floor is engine-independent,
  * integer sums are order-independent — so every downstream dot product is
  * bit-stable across engines).
  *
  * These are the JVM bodies of the [[ScaleFloats]]/[[DotLongArrays]] native
  * expressions: a Catalyst higher-order `transform`/`aggregate`/`zip_with`
  * formulation interprets its lambda per ELEMENT (64 interpreter round-trips
  * per row per dot), and the inlined HOF trees dominate whole-stage-codegen
  * compile time when a query repeats the dot product four ways. A tight
  * primitive loop behind a single static call does neither.
  */
object VecMath {

  /** floor(float → double * 1e7) as long, elementwise. */
  def scaleFloats(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(a.getFloat(i).toDouble * 1e7).toLong
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Dot product of two equal-length long arrays (exact: 1e14 per element,
    * 64 elements — fits a long). */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}
