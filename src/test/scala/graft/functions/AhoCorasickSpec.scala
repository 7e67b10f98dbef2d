package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick dictionary matcher: brute-force parity (all-matches and
  * greedy counting vs straight indexOf scans), replace()-count semantics,
  * classic overlapping dictionaries, and randomized fuzzing over a small
  * alphabet (which maximizes overlap pressure on the failure links). */
class AhoCorasickSpec extends AnyFunSuite {

  /** Greedy non-overlapping count, the way SQL replace() counts. */
  private def bruteGreedy(text: String, term: String): Long = {
    var i = 0; var n = 0L
    while ({ val j = text.indexOf(term, i); if (j >= 0) { n += 1; i = j + term.length; true } else false }) ()
    n
  }

  /** Every occurrence, overlapping included. */
  private def bruteAll(text: String, term: String): Seq[Int] = {
    val acc = Seq.newBuilder[Int]
    var i = text.indexOf(term)
    while (i >= 0) { acc += i; i = text.indexOf(term, i + 1) }
    acc.result()
  }

  private def check(terms: Seq[String], texts: Seq[String]): Unit = {
    val ac = AhoCorasick.build(terms)
    texts.foreach { text =>
      val counts = ac.countGreedy(text)
      val matches = ac.allMatches(text).groupBy(_._1)
      terms.zipWithIndex.foreach { case (term, idx) =>
        assert(counts(idx) === bruteGreedy(text, term),
          s"greedy count of '$term' in '$text'")
        assert(matches.getOrElse(idx, Nil).map(_._2).sorted === bruteAll(text, term),
          s"positions of '$term' in '$text'")
      }
    }
  }

  test("classic overlapping dictionary (he/she/hers/his)") {
    check(Seq("he", "she", "hers", "his"),
      Seq("ushers", "shehehers", "hishe", "", "h", "xyz"))
  }

  test("self-overlapping term counts like replace(): 'aa' in 'aaaa' is 2") {
    val ac = AhoCorasick.build(Seq("aa", "aaa"))
    assert(ac.countGreedy("aaaa").toSeq === Seq(2L, 1L))
    // but allMatches reports every overlap
    assert(ac.allMatches("aaaa").count(_._1 == 0) === 3)
  }

  test("term that is a prefix/suffix/infix of another") {
    check(Seq("scan", "slow scan", "scanner", "can"),
      Seq("slow scanner can scan", "scan", "ca"))
  }

  test("multi-word phrases over the fixture vocabulary") {
    check(Seq("spark", "merge batch", "fast table", "zz_never"),
      Seq("row fast merge batch part value fast spark a a the",
          "fast table fast table merge batchmerge batch"))
  }

  test("null text counts as zero everywhere") {
    val ac = AhoCorasick.build(Seq("x"))
    assert(ac.countGreedy(null).toSeq === Seq(0L))
    assert(ac.allMatches(null).isEmpty)
  }

  test("build rejects empty dictionary, empty terms, duplicates") {
    intercept[IllegalArgumentException](AhoCorasick.build(Nil))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "")))
    intercept[IllegalArgumentException](AhoCorasick.build(Seq("a", "b", "a")))
  }

  test("randomized fuzz: small alphabet, random dictionaries") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 40).foreach { _ =>
      val nTerms = 1 + rnd.nextInt(8)
      val terms = Iterator
        .continually((1 to (1 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
        .distinct.take(nTerms).toSeq
      val texts = (1 to 5).map(_ =>
        (0 until rnd.nextInt(60)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      check(terms, texts)
    }
  }

  test("survives java serialization (broadcast path)") {
    val ac = AhoCorasick.build(Seq("he", "she", "hers"))
    val bos = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bos).writeObject(ac)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readObject().asInstanceOf[AhoCorasick]
    assert(back.countGreedy("ushers").toSeq === ac.countGreedy("ushers").toSeq)
  }
}
