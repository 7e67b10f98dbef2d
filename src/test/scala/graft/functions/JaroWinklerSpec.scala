package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[JaroWinkler]] to the textbook definition via (a) the classic
  * published example values (which DuckDB's native implementation was probed
  * to reproduce this session — the oracle-parity contract), and (b) a fuzz
  * pass against an independently-written quadratic reference implementation
  * (different matching strategy: explicit assignment scan, no early
  * bookkeeping shared with the production code). */
class JaroWinklerSpec extends AnyFunSuite {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic published pairs") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
  }

  test("identity, disjoint, empty") {
    assert(jw("same", "same") === 1.0)
    assert(jw("a", "b") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("", "") === 1.0)
  }

  test("boost applies only above jaro 0.7, prefix capped at 4") {
    // jaro exactly 2/3 with a 4-char common prefix: NO boost
    assert(math.abs(jw("abcdxxxx", "abcdyyyy") - (2.0 / 3.0)) < 1e-12)
    // jaro 5/6 with a 6-char prefix: boost uses l=4, not 6
    val j = 0.8333333333333334
    assert(math.abs(jw("prefixes", "prefixXY") - (j + 4 * 0.1 * (1 - j))) < 1e-12)
    // single transposed leading pair kills the prefix (l=0)
    assert(math.abs(jw("ABCVWXYZ", "CABVWXYZ") - 0.9583333333333334) < 1e-12)
  }

  test("byte-level alphabet (the DuckDB contract)") {
    // 'é' is two UTF-8 bytes: lengths 5 vs 4, three matching bytes
    assert(math.abs(jw("café", "cafe") - 0.8483333333333334) < 1e-12)
  }

  /** Independent quadratic reference: greedy left-to-right match within the
    * window (the definition's canonical assignment), transpositions by
    * order comparison of matched subsequences. */
  private def refJaro(s: Array[Byte], t: Array[Byte]): Double = {
    if (s.isEmpty && t.isEmpty) return 1.0
    if (s.isEmpty || t.isEmpty) return 0.0
    val w = math.max(math.max(s.length, t.length) / 2 - 1, 0)
    val used = new Array[Boolean](t.length)
    val ms = scala.collection.mutable.ArrayBuffer.empty[Byte]
    val matchedT = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- s.indices) {
      var j = math.max(0, i - w)
      var done = false
      while (j <= math.min(t.length - 1, i + w) && !done) {
        if (!used(j) && s(i) == t(j)) { used(j) = true; ms += s(i); matchedT += j; done = true }
        j += 1
      }
    }
    val m = ms.length
    if (m == 0) return 0.0
    val mt = matchedT.sorted.map(t(_))
    val trans = ms.zip(mt).count { case (x, y) => x != y } / 2
    (m.toDouble / s.length + m.toDouble / t.length + (m - trans).toDouble / m) / 3.0
  }

  private def refJw(a: String, b: String): Double = {
    val s = a.getBytes("UTF-8"); val t = b.getBytes("UTF-8")
    val j = refJaro(s, t)
    if (j > 0.7) {
      var l = 0
      while (l < math.min(4, math.min(s.length, t.length)) && s(l) == t(l)) l += 1
      j + l * 0.1 * (1 - j)
    } else j
  }

  test("fuzz vs independent reference over a 3-letter alphabet") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3000) {
      val a = Array.fill(rnd.nextInt(10))(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Array.fill(rnd.nextInt(10))(('a' + rnd.nextInt(3)).toChar).mkString
      assert(jw(a, b) === refJw(a, b), s"mismatch on '$a' vs '$b'")
    }
  }

  test("symmetry") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val a = Array.fill(rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar).mkString
      val b = Array.fill(rnd.nextInt(12))(('a' + rnd.nextInt(4)).toChar).mkString
      assert(jw(a, b) === jw(b, a))
    }
  }
}
