package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[DamerauLev]] to the unrestricted Lowrance-Wagner metric via
  * DuckDB-probed values (the oracle-parity contract) and metric laws. */
class DamerauLevSpec extends AnyFunSuite {

  private def dl(a: String, b: String): Int =
    DamerauLev.distance(UTF8String.fromString(a), UTF8String.fromString(b))

  test("DuckDB-probed values (native damerau_levenshtein, this session)") {
    assert(dl("ca", "abc") === 2)        // unrestricted: swap then insert (OSA says 3)
    assert(dl("a cat", "an act") === 2)  // unrestricted through a space
    assert(dl("abcdef", "abcfad") === 3)
    assert(dl("teh", "the") === 1)
    assert(dl("", "abc") === 3)
    assert(dl("kitten", "sitting") === 3)
    assert(dl("café", "cafe") === 2)     // byte alphabet: é is 2 UTF-8 bytes
    assert(dl("aa", "aa") === 0)
    assert(dl("abab", "baba") === 2)
  }

  test("metric laws on random strings") {
    val rnd = new scala.util.Random(5)
    def word() = Array.fill(rnd.nextInt(9))(('a' + rnd.nextInt(3)).toChar).mkString
    for (_ <- 1 to 1500) {
      val (a, b, c) = (word(), word(), word())
      val ab = dl(a, b)
      assert(ab === dl(b, a), s"symmetry: '$a' '$b'")
      assert(ab >= math.abs(a.length - b.length), "length lower bound")
      assert(ab <= math.max(a.length, b.length), "upper bound")
      assert((ab == 0) === (a == b), "identity of indiscernibles")
      assert(ab <= dl(a, c) + dl(c, b), s"triangle: '$a' '$b' via '$c'")
      // never exceeds plain levenshtein (transpositions only help)
      assert(ab <= lev(a, b), s"vs levenshtein: '$a' '$b'")
    }
  }

  test("adjacent transposition costs exactly one") {
    assert(dl("abcdef", "abcdfe") === 1)
    assert(dl("abcdef", "bacdef") === 1)
    assert(dl("abcd", "badc") === 2)
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
