package graft.functions

/** Greedy longest-match-first WordPiece encoding over positional piece
  * vocabularies (the standard BERT-style inference walk; reference: the
  * published WordPiece algorithm, not any library source). Shared by the
  * batch operator ([[graft.queries.DocQueries.wordpieceTok]], whose oracle
  * pins it by exhaustive segmentation enumeration) and the streaming
  * tokenize-at-ingest form ([[graft.streaming.Streams.wordpieceBatch]]),
  * so the two can never drift. */
object WordPiece {

  /** Encode one word: (piece count, segmentation "first ##rest ##rest").
    *
    * CODEPOINT offsets, not UTF-16 units: the vocabularies are built with
    * Spark SQL length/substring (codepoint semantics), so the greedy walk
    * must measure pieces the same way or supplementary characters (emoji
    * etc.) silently shrink the match window and diverge from the oracle's
    * enumeration (pinned by the non-BMP planted test).
    *
    * When the single codepoint at a position is absent from the positional
    * alphabet (possible at ingest time for words newer than the published
    * vocabulary), it is emitted as its own piece — graceful degradation
    * rather than failure; a corpus-trained vocabulary applied to its own
    * corpus never hits this (every char is in the alphabet by
    * construction). */
  def encodeGreedy(word: String, start: Set[String], cont: Set[String],
                   maxPiece: Int): (Int, String) = {
    val n = word.codePointCount(0, word.length)
    val off = new Array[Int](n + 1)
    var ci = 0; var cp = 0
    while (cp < n) { off(cp) = ci; ci = word.offsetByCodePoints(ci, 1); cp += 1 }
    off(n) = word.length
    val sb = new StringBuilder
    var pieces = 0
    var pos = 0
    while (pos < n) {
      val set = if (pos == 0) start else cont
      var l = math.min(maxPiece, n - pos)
      while (l > 1 && !set.contains(word.substring(off(pos), off(pos + l)))) l -= 1
      if (pos == 0) sb.append(word.substring(off(pos), off(pos + l)))
      else sb.append(" ##").append(word.substring(off(pos), off(pos + l)))
      pieces += 1
      pos += l
    }
    (pieces, sb.toString)
  }
}
