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

  /** Catalyst-side body of the [[graft.functions.EwmaFold]] native
    * expression — identical arithmetic to [[fold]], reading the window's
    * collected array without deserializing it to a Seq. */
  def foldArray(a: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val l = a.numElements()
    var num = 0.0
    var den = 0.0
    var j = 0
    while (j < l) {
      val wgt = 1.0 / (1L << (l - j))
      num += a.getLong(j) * wgt
      den += wgt
      j += 1
    }
    num / den
  }

  /** `hist` is oldest-first; the newest observation weighs 1/2. */
  def fold(hist: Seq[Long]): Double = {
    val l = hist.length
    var num = 0.0
    var den = 0.0
    var j = 0
    while (j < l) {
      val wgt = 1.0 / (1L << (l - j))
      num += hist(j) * wgt
      den += wgt
      j += 1
    }
    num / den
  }
}
