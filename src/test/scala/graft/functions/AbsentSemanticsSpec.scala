package graft.functions

import com.google.common.hash.Hashing
import graft.SparkSpec
import graft.functions.GraftFunctions._
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.functions._

/** The reference's absent-value logic, tested directly (SURVEY.md §7.4
  * "hard parts"): these deliberately DIFFER from SQL three-valued logic. */
class AbsentSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private val T: java.lang.Boolean = true
  private val F: java.lang.Boolean = false
  private val N: java.lang.Boolean = null

  private def table = Seq(
    (T, T), (T, F), (F, F), (T, N), (F, N), (N, N)
  ).toDF("l", "r")

  test("and: absent if either side absent (NOT SQL: false AND null = false)") {
    val got = table.select(absentAnd(col("l"), col("r"))).as[Option[Boolean]].collect()
    assert(got === Array(Some(true), Some(false), Some(false), None, None, None))
    // contrast: SQL 3VL would give Some(false) for (F, N)
    val sql3vl = table.select(col("l") && col("r")).as[Option[Boolean]].collect()
    assert(sql3vl(4) === Some(false))
  }

  test("or: absent if either side absent (NOT SQL: true OR null = true)") {
    val got = table.select(absentOr(col("l"), col("r"))).as[Option[Boolean]].collect()
    assert(got === Array(Some(true), Some(true), Some(false), None, None, None))
  }

  test("equalTo: two absents are equal; absent vs present is false") {
    val df = Seq[(String, String)](("a", "a"), ("a", "b"), (null, null), ("a", null))
      .toDF("l", "r")
    assert(df.select(equalTo(col("l"), col("r"))).as[Boolean].collect() ===
      Array(true, false, true, false))
  }

  test("toBoolean never null: only 'true' (case-insensitive) is true") {
    val df = Seq("true", "TRUE", "false", "yes", "1", null).toDF("s")
    assert(df.select(toBooleanLenient(col("s"))).as[Boolean].collect() ===
      Array(true, true, false, false, false, false))
  }

  test("matchGroup: full-string anchor, null (not empty) on miss") {
    val df = Seq("item-42", "item-42-suffix", "other").toDF("s")
    val got = df.select(matchGroup(col("s"), "item-(\\d+)", 1)).as[Option[String]].collect()
    assert(got === Array(Some("42"), None, None)) // partial match is a miss
  }

  test("matchGroup by NAME resolves to the right capture index at plan time") {
    val df = Seq("v2.7-beta", "nope").toDF("s")
    val pat = "v(?<major>\\d+)\\.(?<minor>\\d+)-(?:rc|beta)"
    assert(df.select(matchGroup(col("s"), pat, "major")).as[Option[String]].collect()
      === Array(Some("2"), None))
    assert(df.select(matchGroup(col("s"), pat, "minor")).as[Option[String]].collect()
      === Array(Some("7"), None))
    // mixed numbered + named + non-capturing + class with a bracket
    val mixed = "(a+)[(]?(?<x>b+)(?:c)(d)"
    assert(GraftFunctions.namedGroupIndex(mixed, "x") === 2)
    intercept[IllegalArgumentException](matchGroup(col("s"), pat, "nosuch"))
  }

  test("checksum canonicalization: repeated keys keep value order") {
    // reference buildNormalizedChecksumString: sorted keys; each value
    // followed by ','; ';' after each key group
    val qs = "b=2&a=first&a=second&x=ignored"
    val canonical = "a=first,second,;b=2,;"
    val expected: Int = {
      @annotation.nowarn("cat=deprecation")
      def h = Hashing.murmur3_32().hashString(canonical, StandardCharsets.UTF_8).asInt()
      h
    }
    val got = Seq(qs).toDF("qs")
      .select(murmur3Utf8(checksumCanonicalString(parseQueryString(col("qs")))))
      .as[Int].collect()(0)
    assert(got === expected)
  }

  test("matchGroup: a participating EMPTY capture is \"\" (present), not absent") {
    import graft.functions.GraftFunctions.matchGroup
    val df = Seq("prefix-", "prefix-aa", "nope").toDF("s")
    val got = df.select(matchGroup(col("s"), "prefix-(a*)", 1))
      .as[Option[String]].collect()
    // java matcher semantics: group(1) on "prefix-" IS the empty string —
    // the old nullif(regexp_extract) collapsed it to absent
    assert(got.toSeq === Seq(Some(""), Some("aa"), None))
    // a group in the unmatched alternation branch did not participate: null
    val alt = Seq("b").toDF("s")
      .select(matchGroup(col("s"), "(a)|b", 1)).as[Option[String]].collect()
    assert(alt.toSeq === Seq(None))
  }

  test("matchGroup: out-of-range group index fails at construction, not as nulls") {
    import graft.functions.GraftFunctions.matchGroup
    // the reference throws from Matcher.group(n) on the first event; a
    // typo'd index must fail at mapping-compile time, not yield all-null
    val e = intercept[IllegalArgumentException](matchGroup(col("s"), "(a)(b)", 3))
    assert(e.getMessage.contains("2 capture group"))
    intercept[IllegalArgumentException](matchGroup(col("s"), "(a)", -1))
    // boundary: group 0 (whole match) and the last group stay valid
    val df = Seq("ab").toDF("s")
    assert(df.select(matchGroup(col("s"), "(a)(b)", 2)).as[Option[String]]
      .collect().toSeq === Seq(Some("b")))
    assert(df.select(matchGroup(col("s"), "(a)(b)", 0)).as[Option[String]]
      .collect().toSeq === Seq(Some("ab")))
  }

  test("checksumMismatch: a NULL params map is corrupt (absent checksum)") {
    import graft.functions.GraftFunctions.checksumMismatch
    val df = Seq("x").toDF("s").select(checksumMismatch(
      lit(null).cast("map<string,array<string>>")).as("c"))
    assert(df.as[Boolean].collect().toSeq === Seq(true))
  }
}
