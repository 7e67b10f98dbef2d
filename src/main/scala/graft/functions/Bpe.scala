package graft.functions

/** Byte-pair-encoding primitives (Sennrich et al. 2016): the per-word
  * symbol algebra shared by the distributed trainer and the encoder
  * ([[graft.queries.DocQueries.bpeTrain]] / `bpeEncode`).
  *
  * Pure JVM loops, deliberately: the merge scan is a tight
  * adjacent-pair walk over a small array, exactly the shape where an
  * interpreted higher-order function loses an order of magnitude to a
  * JVM method (see MinHash.ngrams — same house pattern, measured).
  */
object Bpe {

  /** End-of-word marker, fused onto the final character so merges can
    * distinguish "st " (word-final, as in "newest") from "st" mid-word —
    * the classic formulation. */
  val EndOfWord = "</w>"

  /** A word's initial symbol sequence: its characters, with [[EndOfWord]]
    * fused onto the last one. */
  def wordSymbols(w: String): Array[String] = {
    if (w.isEmpty) return Array.empty
    val out = new Array[String](w.length)
    var i = 0
    while (i < w.length) { out(i) = String.valueOf(w.charAt(i)); i += 1 }
    out(w.length - 1) = out(w.length - 1) + EndOfWord
    out
  }

  /** One merge step: replace every adjacent (left, right) occurrence in
    * `syms` with the fused symbol, left-to-right (so "aaa" under merge
    * (a,a) becomes ["aa", "a..."] — non-overlapping, like the original
    * algorithm). Returns `syms` unchanged (same reference) if the pair
    * never occurs, so the trainer's map can skip re-allocation. */
  def mergePair(syms: Array[String], left: String, right: String): Array[String] = {
    var i = 0
    var hit = false
    while (!hit && i < syms.length - 1) {
      hit = syms(i) == left && syms(i + 1) == right
      i += 1
    }
    if (!hit) return syms
    val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == left && syms(i + 1) == right) {
        buf += syms(i) + syms(i + 1)
        i += 2
      } else {
        buf += syms(i)
        i += 1
      }
    }
    buf.toArray
  }

  /** Greedy rank-order encoding of one word: repeatedly merge the
    * adjacent pair with the LOWEST rank (earliest-learned wins, ties
    * impossible — ranks are unique) until no adjacent pair is mergeable.
    * This is the standard BPE inference loop, not a single left scan:
    * rank priority, not text order, decides merge order. */
  def encodeWord(w: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = wordSymbols(w)
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        syms = mergePair(syms, syms(bi), syms(bi + 1))
        done = syms.length < 2
      }
    }
    syms
  }
}
