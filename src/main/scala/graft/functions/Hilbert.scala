package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert space-filling curve index — the locality-preserving alternative
  * to the Z-order (Morton) layout key (`EventQueries.zorder`): consecutive
  * curve positions are always Manhattan-distance-1 neighbors, so a range of
  * curve values maps to a compact 2-D tile WITHOUT Z-order's diagonal jumps
  * (a Z-value range can span two far-apart quadrant corners; a Hilbert range
  * cannot). Better min/max file-skipping selectivity for 2-D predicates at
  * the cost of a non-trivial bit transform — which is why it's a native
  * codegen'd expression here rather than an unrolled column formula: 16
  * rotate/reflect rounds as column expressions would explode the Catalyst
  * tree (each round references the previous x AND y several times), while
  * the static-call form is one JVM invoke inside whole-stage codegen.
  *
  * Algorithm: the classic iterative xy→d with quadrant rotation (public
  * domain, e.g. Wikipedia "Hilbert curve", Hamilton's compact Hilbert
  * indices). Order 16: a 65536×65536 grid, d in [0, 2^32).
  */
object Hilbert {
  val Order = 16
  val N = 1L << Order // grid side

  /** (x, y) → position on the order-16 Hilbert curve. Inputs are masked to
    * 16 bits, so any long is safe. Reflection uses N-1-v (not s-1-v): both
    * agree on every bit the remaining rounds examine, and N-1-v keeps the
    * intermediates non-negative. */
  def index(x0: Long, y0: Long): Long = {
    var x = x0 & (N - 1)
    var y = y0 & (N - 1)
    var d = 0L
    var s = N >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = N - 1 - x
          y = N - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse (d → (x, y)) — used by specs to prove the unit-step adjacency
    * property; not on any query path. */
  def inverse(d0: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var t = d0 & (N * N - 1)
    var s = 1L
    while (s < N) {
      val rx = (t >> 1) & 1
      val ry = (t ^ rx) & 1
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t >>= 2
      s <<= 1
    }
    (x, y)
  }
}

/** `hilbert_index(x, y)` — order-16 Hilbert curve position, codegen'd as a
  * single static invoke. Null-propagating on either input. Implicit-casts
  * narrower integral inputs to LONG like the numeric built-ins do, so
  * `hilbert_index(CAST(x AS INT), y)` analyzes instead of erroring. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    Hilbert.index(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.Hilbert.index($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hilbert_index"
}
