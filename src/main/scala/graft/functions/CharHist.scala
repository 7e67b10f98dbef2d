package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** 64-bucket saturated code-point histogram + L1 distance — the SOUND
  * pre-verify prune for fuzzy dedup.
  *
  * Bound: one edit operation (insert, delete, substitute — and a Damerau
  * transposition a fortiori, which moves no mass at all) changes at most
  * two code-point counts by one each, so
  * `L1(hist(a), hist(b)) <= 2 * lev(a, b)` for the exact per-code-point
  * histogram. Folding code points into 64 buckets and saturating counts
  * at 255 can only ever CANCEL differences, never create them, so the
  * inequality survives both compressions. A candidate pair with
  * `l1 > 2 * k` therefore provably cannot verify at threshold `k` and can
  * skip both the text-fetch shuffle and the banded DP. The filter changes
  * no results — which is why the DuckDB oracle does not model it.
  *
  * The xor-fold (`cp ^ cp>>>6 ^ cp>>>12`) keeps non-ASCII planes from
  * aliasing onto the ASCII buckets wholesale (plain `cp & 63` maps every
  * plane onto the same 64 slots with plane-local structure intact; the
  * fold mixes the high bits in), which keeps the bound usefully tight on
  * mixed-script corpora while costing two shifts per code point. */
object CharHist {
  val Buckets = 64

  def hist(s: UTF8String): Array[Byte] = {
    val out = new Array[Byte](Buckets)
    val str = s.toString
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val b = (cp ^ (cp >>> 6) ^ (cp >>> 12)) & (Buckets - 1)
      val v = out(b) & 0xff
      if (v < 255) out(b) = (v + 1).toByte
    }
    out
  }

  def l1(a: Array[Byte], b: Array[Byte]): Int = {
    var s = 0
    var i = 0
    while (i < Buckets) { s += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1 }
    s
  }
}
