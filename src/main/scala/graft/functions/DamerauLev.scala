package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UNRESTRICTED Damerau-Levenshtein distance (Lowrance & Wagner 1975),
  * byte-level — transposed characters may drift apart through later edits
  * ('ca' -> 'abc' costs 2: swap then insert), unlike the more common
  * optimal-string-alignment restriction (which would say 3).
  *
  * Pinned to DuckDB's native `damerau_levenshtein` for oracle parity
  * (probed this session: 'ca'/'abc'=2 and 'a cat'/'an act'=2 prove
  * unrestricted; 'café'/'cafe'=2 proves byte alphabet). The `da` last-seen
  * table is indexed by byte value — 256 slots, no per-call hashing. */
object DamerauLev {

  def dist(s: Array[Byte], t: Array[Byte]): Int = {
    val n = s.length
    val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    val h = Array.ofDim[Int](n + 2, m + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= n) { h(i + 1)(0) = inf; h(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= m) { h(0)(j + 1) = inf; h(1)(j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= n) {
      var db = 0
      j = 1
      while (j <= m) {
        val k = da(t(j - 1) & 0xFF)
        val l = db
        var cost = 1
        if (s(i - 1) == t(j - 1)) { cost = 0; db = j }
        val sub = h(i)(j) + cost
        val ins = h(i + 1)(j) + 1
        val del = h(i)(j + 1) + 1
        val tra = h(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        h(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, tra))
        j += 1
      }
      da(s(i - 1) & 0xFF) = i
      i += 1
    }
    h(n + 1)(m + 1)
  }

  def distance(a: UTF8String, b: UTF8String): Int = dist(a.getBytes, b.getBytes)
}

/** `damerau_levenshtein(l, r)` as a codegen'd binary expression. */
case class DamerauLevDistance(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    DamerauLev.distance(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.DamerauLev.distance($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevDistance =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "damerau_levenshtein"
}
