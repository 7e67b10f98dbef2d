package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unicode normalization: published normalization vectors (UAX #15
  * examples), idempotence, null propagation, and the codegen column path.
  * Composed/decomposed forms are spelled as explicit escapes — WYSIWYG
  * literals would make the assertions vacuous. */
class UnicodesSpec extends SparkSpec {
  import spark.implicits._

  private val eAcute = "\u00e9"          // precomposed é
  private val eCombining = "e\u0301"     // e + combining acute

  test("NFC composes decomposed accents; NFD decomposes them back") {
    assert(Unicodes.nfc("caf" + eCombining) === "caf" + eAcute)
    assert(Unicodes.nfd("caf" + eAcute) === "caf" + eCombining)
    assert(Unicodes.nfc(Unicodes.nfd("naïve")) === "naïve")
  }

  test("NFKC folds compatibility variants NFC must preserve") {
    // UAX #15 classics: ligature fi (U+FB01), fullwidth A (U+FF21),
    // superscript 2 (U+00B2)
    assert(Unicodes.nfkc("ﬁ") === "fi")
    assert(Unicodes.nfc("ﬁ") === "ﬁ")
    assert(Unicodes.nfkc("Ａ") === "A")
    assert(Unicodes.nfkc("2²") === "22")
    // singleton: Angstrom sign (U+212B) → A-with-ring (U+00C5) under BOTH
    assert(Unicodes.nfc("\u212b") === "\u00c5")
    assert(Unicodes.nfkc("\u212b") === "\u00c5")
  }

  test("normalization is idempotent on every form") {
    val probes = Seq("caf" + eCombining, "ﬁscal", "Ångström", "plain ascii")
    for (p <- probes) {
      assert(Unicodes.nfc(Unicodes.nfc(p)) === Unicodes.nfc(p))
      assert(Unicodes.nfkc(Unicodes.nfkc(p)) === Unicodes.nfkc(p))
      assert(Unicodes.nfd(Unicodes.nfd(p)) === Unicodes.nfd(p))
      assert(Unicodes.nfkd(Unicodes.nfkd(p)) === Unicodes.nfkd(p))
    }
  }

  test("column path: codegen'd expression matches the static function, nulls pass") {
    val df = Seq(Some("caf" + eCombining + " ﬁn"), Some("Å"), None)
      .toDF("s")
      .select(
        GraftFunctions.unicodeNormalize(col("s"), "NFC").as("nfc"),
        GraftFunctions.unicodeNormalize(col("s"), "NFKC").as("nfkc"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "caf" + eAcute + " ﬁn")
    assert(rows(0).getString(1) === "caf" + eAcute + " fin")
    assert(rows(1).getString(0) === "Å")
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
  }

  test("unknown form is rejected at construction") {
    intercept[IllegalArgumentException] {
      GraftFunctions.unicodeNormalize(lit("x"), "NFX")
    }
  }
}
