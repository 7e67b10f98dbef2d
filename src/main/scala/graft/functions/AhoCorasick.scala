package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern string matcher for dictionary tagging
  * (blocklist scans, taxonomy term spotting) over a document corpus.
  *
  * Why this exists: the naive plan for "count N dictionary terms in each
  * document" is N `LIKE`/`instr` probes per row — O(terms × |text|). The
  * automaton matches ALL terms in one left-to-right pass — O(|text| +
  * matches) per document, independent of dictionary size — which is the
  * difference between feasible and not at 100 TB with a 10^5-phrase
  * blocklist. The reference has no dictionary-scan operator; this is part
  * of the training-data-pipeline extension layer (SURVEY.md §2 extras).
  *
  * The structure is immutable after construction and Serializable, so it
  * broadcasts once per job and is shared read-only by all task threads.
  *
  * Counting semantics: [[countGreedy]] counts greedy NON-overlapping
  * occurrences per term, scanning left to right and skipping past each
  * match of that term — exactly the count implied by SQL's
  * `(length(s) - length(replace(s, t, ''))) / length(t)`, which keeps the
  * operator oracle-checkable in DuckDB. [[allMatches]] reports every
  * (possibly overlapping) match for callers that want raw positions.
  */
final class AhoCorasick private (
    gotoMap: Array[Map[Char, Int]],
    fail: Array[Int],
    hits: Array[Array[Int]], // term indexes whose match ends at this node
    val termLengths: Array[Int])
    extends Serializable {

  def nTerms: Int = termLengths.length

  @inline private def step(state: Int, c: Char): Int = {
    var s = state
    while (s != 0 && !gotoMap(s).contains(c)) s = fail(s)
    gotoMap(s).getOrElse(c, 0)
  }

  /** Greedy non-overlapping occurrence count per term (replace() parity). */
  def countGreedy(text: String): Array[Long] = {
    val counts = new Array[Long](nTerms)
    if (text == null) return counts
    val nextStart = new Array[Int](nTerms)
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      val out = hits(state)
      var j = 0
      while (j < out.length) {
        val t = out(j)
        val start = i - termLengths(t) + 1
        if (start >= nextStart(t)) {
          counts(t) += 1L
          nextStart(t) = i + 1
        }
        j += 1
      }
      i += 1
    }
    counts
  }

  /** Every match as (termIndex, startOffset), overlapping included. */
  def allMatches(text: String): Seq[(Int, Int)] = {
    val acc = Seq.newBuilder[(Int, Int)]
    if (text == null) return acc.result()
    var state = 0
    var i = 0
    while (i < text.length) {
      state = step(state, text.charAt(i))
      val out = hits(state)
      var j = 0
      while (j < out.length) {
        acc += ((out(j), i - termLengths(out(j)) + 1))
        j += 1
      }
      i += 1
    }
    acc.result()
  }
}

object AhoCorasick {

  /** Builds the automaton: trie of terms, then BFS failure links with
    * dictionary-suffix outputs merged into each node's hit list (so a
    * single state visit reports every term ending there). Duplicate and
    * empty terms are rejected — a dictionary is a set of non-empty
    * phrases, and silent dedupe would desynchronize term indexes from the
    * caller's term list. */
  def build(terms: Seq[String]): AhoCorasick = {
    require(terms.nonEmpty, "empty dictionary")
    require(terms.forall(t => t != null && t.nonEmpty), "empty term")
    require(terms.distinct.size == terms.size, "duplicate terms")

    val gotoBuf = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val ownHits = mutable.ArrayBuffer(List.empty[Int])
    terms.zipWithIndex.foreach { case (term, idx) =>
      var node = 0
      term.foreach { c =>
        node = gotoBuf(node).getOrElseUpdate(c, {
          gotoBuf += mutable.Map.empty[Char, Int]
          ownHits += Nil
          gotoBuf.size - 1
        })
      }
      ownHits(node) = idx :: ownHits(node)
    }

    val n = gotoBuf.size
    val fail = new Array[Int](n)
    val merged = new Array[List[Int]](n)
    merged(0) = ownHits(0)
    val queue = mutable.Queue.empty[Int]
    gotoBuf(0).valuesIterator.foreach { child =>
      fail(child) = 0
      merged(child) = ownHits(child)
      queue += child
    }
    while (queue.nonEmpty) {
      val node = queue.dequeue()
      gotoBuf(node).foreach { case (c, child) =>
        var f = fail(node)
        while (f != 0 && !gotoBuf(f).contains(c)) f = fail(f)
        fail(child) = if (gotoBuf(f).contains(c) && gotoBuf(f)(c) != child) gotoBuf(f)(c) else 0
        merged(child) = ownHits(child) ::: merged(fail(child))
        queue += child
      }
    }

    new AhoCorasick(
      gotoBuf.map(_.toMap).toArray,
      fail,
      merged.map(_.toArray.sorted),
      terms.map(_.length).toArray)
  }
}
