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

  /** floor(float → double * 1e7) as long, elementwise. Null elements map to
    * null elements (the semantics of the `transform` formulation this
    * replaces); the common no-null case stays on the primitive fast path. */
  def scaleFloats(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) {
        out(i) = math.floor(a.getFloat(i).toDouble * 1e7).toLong
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!a.isNullAt(i))
          out(i) = math.floor(a.getFloat(i).toDouble * 1e7).toLong
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Dot product of two equal-length long arrays (exact: 1e14 per element,
    * 64 elements — fits a long). Mismatched lengths or null elements yield
    * null — the same result the `aggregate(zip_with(...))` formulation
    * produced (zip_with null-pads the shorter side, and a null product
    * nulls the running sum). */
  def dotLong(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
