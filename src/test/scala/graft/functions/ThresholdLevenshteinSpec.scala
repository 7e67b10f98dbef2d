package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** LevenshteinBounded must be bit-identical to the built-in
  * `levenshtein(a, b, k)` on every input — the fuzzy-dedup operators
  * swapped it in purely for the early-abandon speedup, so any semantic
  * drift would silently change oracled results. */
class ThresholdLevenshteinSpec extends SparkSpec {

  private def builtin(a: String, b: String, k: Int): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b), k)

  test("kernel parity with the built-in on random word-soup pairs") {
    val vocab = Array("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch", "spark", "a", "the")
    val rnd = new scala.util.Random(7L)
    def doc(): String =
      (1 to (1 + rnd.nextInt(60))).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    (1 to 2000).foreach { _ =>
      val (a, b) = (doc(), doc())
      val k = rnd.nextInt(60)
      assert(ThresholdLevenshtein.distance(
        UTF8String.fromString(a), UTF8String.fromString(b), k).intValue ===
        builtin(a, b, k), s"k=$k a='$a' b='$b'")
    }
  }

  test("kernel parity on near-duplicates (small true distances)") {
    val rnd = new scala.util.Random(11L)
    def mutate(s: String, edits: Int): String = {
      val sb = new StringBuilder(s)
      (1 to edits).foreach { _ =>
        val i = rnd.nextInt(math.max(1, sb.length))
        rnd.nextInt(3) match {
          case 0 if sb.nonEmpty => sb.setCharAt(math.min(i, sb.length - 1), ('a' + rnd.nextInt(26)).toChar)
          case 1                => sb.insert(math.min(i, sb.length), ('a' + rnd.nextInt(26)).toChar)
          case _ if sb.nonEmpty => sb.deleteCharAt(math.min(i, sb.length - 1))
          case _                => ()
        }
      }
      sb.toString
    }
    (1 to 1000).foreach { _ =>
      val a = (1 to 50).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      val b = mutate(a, rnd.nextInt(50))
      val k = rnd.nextInt(50)
      assert(ThresholdLevenshtein.distance(
        UTF8String.fromString(a), UTF8String.fromString(b), k).intValue ===
        builtin(a, b, k), s"k=$k a='$a' b='$b'")
    }
  }

  test("edges: empty strings, k=0, length-gap pruning, multi-byte, surrogates") {
    val cases = Seq(
      ("", "", 0), ("", "abc", 2), ("", "abc", 3), ("abc", "abc", 0),
      ("kitten", "sitting", 3), ("kitten", "sitting", 2),
      ("héllo wörld", "hello world", 4), ("ünïcödé", "unicode", 10),
      // astral symbols exercise the surrogate fallback path
      ("a😀b", "ab", 2), ("😀", "😁", 1))
    cases.foreach { case (a, b, k) =>
      assert(ThresholdLevenshtein.distance(
        UTF8String.fromString(a), UTF8String.fromString(b), k).intValue ===
        builtin(a, b, k), s"k=$k a='$a' b='$b'")
    }
  }

  test("expression: codegen + SQL registration agree with the built-in") {
    import spark.implicits._
    val df = Seq(
      ("kitten", "sitting"), ("same", "same"), ("abcdef", "uvwxyz"),
      (null, "x"), ("x", null), (null: String, null: String))
      .toDF("a", "b")
    val got = df.select(
      GraftFunctions.levenshteinBounded(col("a"), col("b"), 3).as("mine"),
      levenshtein(col("a"), col("b"), 3).as("ref"))
      .collect()
    got.foreach { r => assert(r.isNullAt(0) === r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getInt(0) === r.getInt(1)) }

    val viaSql = spark.sql(
      "SELECT levenshtein_bounded('kitten', 'sitting', 3) v").head.getInt(0)
    assert(viaSql === 3)
    assert(spark.sql("SELECT levenshtein_bounded('kitten', 'sitting', 2) v")
      .head.getInt(0) === -1)
    intercept[Exception](
      spark.sql("SELECT levenshtein_bounded('a', 'b', NULL)").collect())
  }
}
