package graft.functions

/** Single-pass whitespace-token statistics.
  *
  * The quality / language-ID / token-stats operators all need token counts
  * over the same `split(trim(text), "\\s+")` tokenization. Expressed with
  * higher-order functions (`filter`/`aggregate`/`array_distinct`) each
  * statistic re-evaluates the regex split per use — HOFs are interpreted
  * (no whole-stage codegen) and sit outside runtime subexpression
  * elimination, so a 3-statistic projection regex-splits every document
  * 3-5 times. This computes all of them in ONE pass over the characters
  * with no regex and no intermediate token array.
  *
  * Token semantics are bit-identical to `split(trim(text), "\\s+")` with
  * the SQL (space-only) trim both engines apply:
  *  - separators are exactly Java regex `\s` = [ \t\n\f\r];
  *  - a text whose space-trimmed form STARTS with other whitespace yields
  *    the leading empty token the regex split produces;
  *  - an all-space text yields the single empty token that
  *    `"".split("\\s+")` produces: nTokens = nTypes = 1, charSum = 0.
  */
object TextStats {

  /** nTokens/nTypes as Int and charSum as Long mirror the column types of
    * the HOF formulation (`size(...)` is IntegerType; the length fold is
    * LongType), so downstream divisions produce identical doubles. */
  final case class Stats(nTokens: Int, nTypes: Int, stopHits: Int, charSum: Long)

  // the RE2/oracle whitespace class ([[MinHash.Ws]]): NO vertical tab —
  // java regex \s would include \x0B and diverge from the SQL side
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  def compute(text: String, stopwords: Set[String]): Stats = {
    if (text == null) return null
    val s = MinHash.sqlTrim(text) // SQL-parity: spaces only, shared definition
    if (s.isEmpty) return Stats(1, 1, if (stopwords("")) 1 else 0, 0L)
    val types = new java.util.HashSet[String]()
    var n = 0; var hits = 0; var chars = 0L
    var i = 0; val len = s.length
    // split-limit(-1) semantics (Spark split / DuckDB string_split_regex):
    // a LEADING separator yields an empty first token and a TRAILING
    // separator an empty last token
    if (isWs(s.charAt(0))) {
      n += 1
      types.add("")
      if (stopwords("")) hits += 1
    }
    if (isWs(s.charAt(len - 1))) {
      n += 1
      types.add("")
      if (stopwords("")) hits += 1
    }
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        n += 1
        chars += tok.length
        types.add(tok)
        if (stopwords(tok)) hits += 1
      }
    }
    Stats(n, types.size, hits, chars)
  }
}
