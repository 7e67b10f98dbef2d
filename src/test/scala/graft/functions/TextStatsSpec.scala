package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the single-pass [[TextStats]] to the `split(trim(text), "\\s+")`
  * formulation it replaced: for any input, every statistic must equal the
  * value computed from the actual token array. */
class TextStatsSpec extends AnyFunSuite {

  private val stop = Set("the", "a", "of", "and", "to", "in")

  /** The original definition, via the real regex split over the SQL-parity
    * space-only trim (Spark/DuckDB `trim` — NOT java String.trim, which
    * also strips \t/\n edges and would diverge from the oracles). */
  private def reference(text: String): TextStats.Stats = {
    if (text == null) return null
    val tk = MinHash.sqlToks(text)
    TextStats.Stats(
      tk.length,
      tk.distinct.length,
      tk.count(stop),
      tk.map(_.length.toLong).sum)
  }

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(r.passed, r.status.toString)
  }

  test("matches the regex-split definition on generated text") {
    // Bias toward the interesting alphabet: stopwords, whitespace variants
    // (every \s char), punctuation, repeats.
    val token = Gen.oneOf(
      Gen.oneOf(stop.toSeq),
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString),
      Gen.const("x"))
    val ws = Gen.nonEmptyListOf(
      Gen.oneOf(' ', '\t', '\n', '', '\f', '\r')).map(_.mkString)
    val text = for {
      toks <- Gen.listOf(token)
      seps <- Gen.listOfN(toks.length + 1, ws)
      lead <- Gen.oneOf("", " ", "\n\t")
      trail <- Gen.oneOf("", " ", "\r")
    } yield lead + toks.zip(seps).map { case (t, s) => t + s }.mkString + trail
    check(Prop.forAll(text) { s =>
      TextStats.compute(s, stop) == reference(s)
    })
  }

  test("edge cases: null, empty, all-whitespace, single token") {
    assert(TextStats.compute(null, stop) == null)
    assert(TextStats.compute("", stop) == reference(""))
    assert(TextStats.compute("   \t\n ", stop) == reference("   \t\n "))
    assert(TextStats.compute("the", stop) == reference("the"))
    assert(TextStats.compute("a b a", stop) == reference("a b a"))
  }

  test("non-\\s unicode whitespace is NOT a separator (regex parity)") {
    //   (nbsp) is not matched by Java \s — the single-pass tokenizer
    // must also treat it as a token character.
    val s = "foo bar baz"
    assert(TextStats.compute(s, stop) == reference(s))
    assert(TextStats.compute(s, stop).nTokens == 2)
  }
}
