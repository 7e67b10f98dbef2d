package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The fuzzy-verify prune is only allowed to exist because
  * `L1(hist(a), hist(b)) <= 2 * lev(a, b)` — pin that bound against the
  * PRODUCTION DP on randomized pairs (so the prune can never drop a pair
  * the verify would have kept), plus the histogram's own invariants. */
class CharHistSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0xC4A7)

  private def randText(n: Int, alphabet: String): String =
    (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString

  private def edit(s: String, ops: Int, alphabet: String): String = {
    val sb = new StringBuilder(s)
    (0 until ops).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 if sb.nonEmpty => // substitute
          sb.setCharAt(rnd.nextInt(sb.length), alphabet(rnd.nextInt(alphabet.length)))
        case 1 if sb.nonEmpty => // delete
          sb.deleteCharAt(rnd.nextInt(sb.length)): Unit
        case _ => // insert
          sb.insert(rnd.nextInt(sb.length + 1), alphabet(rnd.nextInt(alphabet.length))): Unit
      }
    }
    sb.toString
  }

  private def l1(a: String, b: String): Int =
    CharHist.l1(CharHist.hist(UTF8String.fromString(a)),
      CharHist.hist(UTF8String.fromString(b)))

  test("histogram counts sum to the code-point length (unsaturated)") {
    Seq("", "a", "hello world", "mixed é中😀 text").foreach { s =>
      val h = CharHist.hist(UTF8String.fromString(s))
      assert(h.map(_ & 0xff).sum == s.codePointCount(0, s.length), s"for '$s'")
    }
  }

  test("saturation caps a bucket at 255 and keeps the bound one-sided") {
    val h = CharHist.hist(UTF8String.fromString("a" * 1000))
    assert(h.map(_ & 0xff).max == 255)
    // saturated-vs-unsaturated difference can only SHRINK L1: 1000 a's vs
    // 300 a's differ by 700 true, reads 0 here — a smaller lower bound,
    // never a larger one, so the prune stays sound
    assert(l1("a" * 1000, "a" * 300) == 0)
  }

  test("L1 <= 2 * lev against the production DP on random edited pairs") {
    val alphabets = Seq("ab", "abcdefgh", ('a' to 'z').mkString + " .,")
    for (_ <- 1 to 300) {
      val al = alphabets(rnd.nextInt(alphabets.size))
      val a = randText(20 + rnd.nextInt(300), al)
      val b = edit(a, rnd.nextInt(50), al)
      val d = ThresholdLevenshtein.distance(
        UTF8String.fromString(a), UTF8String.fromString(b), 1000).intValue()
      assert(d >= 0, "distance must resolve under a huge threshold")
      assert(l1(a, b) <= 2 * d, s"bound violated: l1=${l1(a, b)} lev=$d")
    }
  }

  test("prune keeps every pair the verify keeps (threshold semantics)") {
    val k = 12
    for (_ <- 1 to 200) {
      val a = randText(50 + rnd.nextInt(200), "abcdefghij ")
      val b = edit(a, rnd.nextInt(2 * k), "abcdefghij ")
      val d = ThresholdLevenshtein.distance(
        UTF8String.fromString(a), UTF8String.fromString(b), k).intValue()
      if (d >= 0) // verify would keep it -> the prune must too
        assert(l1(a, b) <= 2 * k, s"pruned a verifying pair: l1=${l1(a, b)} d=$d")
    }
  }

  test("L1 <= 2 * DAMERAU-lev (transpositions move the multiset by 0) — " +
      "the record-link prune's bound, incl. transposition-heavy pairs") {
    def swapEdit(s: String, ops: Int, alphabet: String): String = {
      val sb = new StringBuilder(s)
      (0 until ops).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 if sb.length >= 2 => // transpose adjacent
            val i = rnd.nextInt(sb.length - 1)
            val c = sb.charAt(i); sb.setCharAt(i, sb.charAt(i + 1)); sb.setCharAt(i + 1, c)
          case 1 if sb.nonEmpty =>
            sb.setCharAt(rnd.nextInt(sb.length), alphabet(rnd.nextInt(alphabet.length)))
          case 2 if sb.nonEmpty =>
            sb.deleteCharAt(rnd.nextInt(sb.length)): Unit
          case _ =>
            sb.insert(rnd.nextInt(sb.length + 1), alphabet(rnd.nextInt(alphabet.length))): Unit
        }
      }
      sb.toString
    }
    for (_ <- 1 to 300) {
      val a = randText(10 + rnd.nextInt(40), "abcdefghij#0123 ")
      val b = swapEdit(a, rnd.nextInt(8), "abcdefghij#0123 ")
      val d = DamerauLev.distance(UTF8String.fromString(a), UTF8String.fromString(b))
      assert(l1(a, b) <= 2 * d, s"DL bound violated: l1=${l1(a, b)} dl=$d a='$a' b='$b'")
    }
  }

  test("astral code points count once (surrogate pairs are one edit unit)") {
    val grin = new String(Character.toChars(0x1F600))
    assert(l1(grin * 3, grin * 3) == 0)
    // replacing one astral char with another moves 2 of L1 at most
    val other = new String(Character.toChars(0x1F601))
    assert(l1(grin * 3, grin * 2 + other) <= 2)
  }
}
