package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Textbook Jaro / Jaro-Winkler similarity (Winkler 1990), byte-level.
  *
  * Semantics are pinned to the classic definition so the operator can be
  * oracled against an INDEPENDENT engine implementation (DuckDB's native
  * `jaro_winkler_similarity`) rather than a replay of our own arithmetic:
  *  - match window = max(|s|,|t|)/2 - 1 (floor, min 0);
  *  - transpositions = floor(#order-mismatched matches / 2);
  *  - Winkler boost only when jaro > 0.7, common-prefix length capped at 4,
  *    scaling p = 0.1.
  * Probed against DuckDB this session: MARTHA/MARHTA=0.961..., boost NOT
  * applied at jaro<=0.7, prefix cap 4, and byte (not codepoint) alphabet
  * ('café'/'cafe' = 0.8483...). Callers that need engine-parity therefore
  * restrict inputs to ASCII, where byte==char for every engine.
  */
object JaroWinkler {

  /** Plain Jaro similarity over byte strings. */
  def jaro(s: Array[Byte], t: Array[Byte]): Double = {
    val sl = s.length
    val tl = t.length
    if (sl == 0 && tl == 0) return 1.0
    if (sl == 0 || tl == 0) return 0.0
    val window = math.max(math.max(sl, tl) / 2 - 1, 0)
    val sMatch = new Array[Boolean](sl)
    val tMatch = new Array[Boolean](tl)
    var m = 0
    var i = 0
    while (i < sl) {
      val lo = math.max(0, i - window)
      val hi = math.min(tl - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s(i) == t(j)) {
          sMatch(i) = true; tMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var mismatched = 0
    i = 0
    while (i < sl) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s(i) != t(k)) mismatched += 1
        k += 1
      }
      i += 1
    }
    val trans = mismatched / 2
    (m.toDouble / sl + m.toDouble / tl + (m - trans).toDouble / m) / 3.0
  }

  /** Jaro-Winkler: jaro plus the common-prefix boost above 0.7. */
  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.getBytes
    val t = b.getBytes
    val j = jaro(s, t)
    if (j > 0.7) {
      val cap = math.min(4, math.min(s.length, t.length))
      var l = 0
      while (l < cap && s(l) == t(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}

/** `jaro_winkler(l, r)` as a codegen'd binary expression — one static call,
  * stays inside whole-stage codegen on the entity-link verify path. */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = graft.functions.JaroWinkler.similarity($l, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaro_winkler"
}
