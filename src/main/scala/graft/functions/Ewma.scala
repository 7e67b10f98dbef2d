package graft.functions

/** Truncated exponentially-weighted moving average, alpha = 1/2 over the
  * last [[WindowSize]] observations — the ONE fold shared by the batch
  * query ([[graft.queries.EventQueries.ewma]]) and the streaming form
  * ([[graft.streaming.Streams.ewmaStream]]), so batch/stream parity holds
  * by construction.
  *
  * All weights are dyadic (1 / (1L << k), k <= [[WindowSize]]) and values
  * are scaled longs < 2^20, so every partial sum is an exact double and
  * the fold is order- and engine-reproducible; only the final quotient
  * rounds (at the call sites).
  */
object Ewma {

  val WindowSize = 20

  /** Weight of the element `dist` positions behind the newest (newest =
    * dist 0, weight 1/2). Beyond 62 the dyadic weight underflows a long
    * shift — the JVM would WRAP the shift (1L << 64 == 1, giving an old
    * element full weight); those elements contribute exactly 0, which is
    * also the correct limit. Guarded here because `ewma_fold` is exposed
    * as a general SQL function on arbitrary-length arrays, not only the
    * 20-capped internal window. */
  private def weight(dist: Int): Double =
    if (dist < 62) 1.0 / (1L << (dist + 1)) else 0.0

  /** Catalyst-side body of the [[graft.functions.EwmaFold]] native
    * expression — identical arithmetic to [[fold]], reading the window's
    * collected array without deserializing it to a Seq. Empty array →
    * null (the expression is nullable), not NaN. */
  def foldArray(a: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    val l = a.numElements()
    if (l == 0) return null
    var num = 0.0
    var den = 0.0
    var j = 0
    while (j < l) {
      val wgt = weight(l - 1 - j)
      num += a.getLong(j) * wgt
      den += wgt
      j += 1
    }
    num / den
  }

  /** `hist` is oldest-first, non-empty; the newest observation weighs 1/2. */
  def fold(hist: Seq[Long]): Double = {
    val l = hist.length
    var num = 0.0
    var den = 0.0
    var j = 0
    while (j < l) {
      val wgt = weight(l - 1 - j)
      num += hist(j) * wgt
      den += wgt
      j += 1
    }
    num / den
  }
}
