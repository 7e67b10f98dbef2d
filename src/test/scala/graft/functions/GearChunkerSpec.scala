package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** Gear-hash CDC: tiling, bound enforcement, shift invariance, a plain
  * re-derivation of the boundary rule, and the Spark expression path. */
class GearChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(s: String) = GearChunker.chunks(UTF8String.fromString(s))

  test("chunks tile the input and respect the min/max bounds") {
    val text = ("the quick brown fox jumps over the lazy dog " * 60).trim
    val ch = chunksOf(text)
    assert(ch.head._1 === 1)
    assert(ch.map(_._2).sum === text.getBytes("UTF-8").length)
    ch.sliding(2).foreach {
      case Array(a, b) => assert(b._1 === a._1 + a._2, "chunks must be contiguous")
      case _ =>
    }
    // every non-final chunk obeys the bounds
    ch.dropRight(1).foreach { c =>
      assert(c._2 >= GearChunker.MinLen && c._2 <= GearChunker.MaxLen)
    }
    assert(ch.last._2 <= GearChunker.MaxLen)
    assert(ch.length > 5, s"expected several chunks, got ${ch.length}")
  }

  test("boundary positions re-derive from the documented recurrence") {
    val text = "content defined chunking boundaries derive from local bytes only " * 20
    val bytes = text.getBytes("UTF-8")
    // independent replay of the documented rule
    val expected = scala.collection.mutable.ArrayBuffer.empty[Int]
    var (h, start) = (0L, 0)
    for (i <- bytes.indices) {
      h = (h << 1) + GearChunker.gearTable(bytes(i) & 0xff)
      val len = i - start + 1
      if ((len >= GearChunker.MinLen && (h & GearChunker.Mask) == 0L &&
            i != bytes.length - 1) || len == GearChunker.MaxLen) {
        expected += start; start = i + 1; h = 0L
      }
    }
    if (start < bytes.length) expected += start
    assert(chunksOf(text).map(_._1 - 1).toSeq === expected.toSeq)
    // and chunk hashes are FNV-1a of exactly the chunk bytes
    chunksOf(text).foreach { case (st, ln, hash) =>
      assert(hash === GearChunker.fnv64(bytes, st - 1, st - 1 + ln))
    }
  }

  test("shift invariance: a head edit re-synchronizes; tail chunks survive") {
    val base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 30).trim
    val edited = "COMPLETELY-NEW-HEAD-CONTENT " + base
    val a = chunksOf(base).map(_._3)
    val b = chunksOf(edited).map(_._3).toSet
    val kept = a.count(b.contains)
    assert(kept.toDouble / a.length >= 0.7,
      s"only $kept/${a.length} chunks survived a head insertion")
  }

  test("the gear table is the documented md5 derivation, not arbitrary state") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("gear:0".getBytes("UTF-8"))
    var h = 0L
    (0 until 8).foreach(j => h = (h << 8) | (d(j) & 0xffL))
    assert(GearChunker.gearTable(0) === h)
    assert(GearChunker.gearTable.distinct.length === 256, "no colliding entries")
  }

  test("rawChunks: tiles, is window-local, and agrees with a mod-2^21 replay") {
    val text = "raw gear walk with no restart and no suppression bounds " * 25
    val ch = GearChunker.rawChunks(text)
    assert(ch.head._1 === 0)
    assert(ch.map(_._2).sum === text.codePointCount(0, text.length))
    ch.sliding(2).foreach {
      case Array(a, b) => assert(b._1 === a._1 + a._2)
      case _ =>
    }
    // independent replay via the 21-codepoint window sum the SQL oracle
    // uses — pure position-local math, no sequential state
    val cps = text.codePoints().toArray
    val gl = GearChunker.gearTableLow21
    val expected = (0 until cps.length - 1).filter { i =>
      val h = (0 to math.min(20, i)).map(k => (gl(cps(i - k) & 0xff) << k) & 0x1FFFFFL)
        .sum & 0x1FFFFFL
      (h & GearChunker.Mask) == 0L
    }.map(_ + 1) // boundary AFTER 0-based codepoint i = cut offset i+1
    assert(ch.dropRight(1).map(c => c._1 + c._2).toSeq === expected)
  }

  test("blockKeys: independent two-pass replay, tags, and edge shapes") {
    val text = "the scattered edit blocking walk runs two independent gear tables " * 12
    val bytes = text.getBytes("UTF-8")
    // naive re-derivation: run the documented parameterized walk per table,
    // fnv each span, tag pass 2, dedupe preserving first-seen order
    def walk(table: Array[Long]): Seq[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var (h, start) = (0L, 0)
      for (i <- bytes.indices) {
        h = (h << 1) + table(bytes(i) & 0xff)
        val len = i - start + 1
        if ((len >= GearChunker.BlockMinLen &&
              (h & GearChunker.BlockMask) == 0L && i != bytes.length - 1) ||
            len == GearChunker.BlockMaxLen) {
          out += ((start, len)); start = i + 1; h = 0L
        }
      }
      if (start < bytes.length) out += ((start, bytes.length - start))
      out.toSeq
    }
    val expected = scala.collection.mutable.LinkedHashSet.empty[Long]
    walk(GearChunker.gearTable).foreach { case (s, l) =>
      expected += GearChunker.fnv64(bytes, s, s + l)
    }
    walk(GearChunker.gearTable2).foreach { case (s, l) =>
      expected += (GearChunker.fnv64(bytes, s, s + l) ^ GearChunker.BlockSeed2Tag)
    }
    val got = GearChunker.blockKeys(UTF8String.fromString(text))
    assert(got.toSeq === expected.toSeq)
    // both walks tile with the blocking bounds
    for (t <- Seq(GearChunker.gearTable, GearChunker.gearTable2)) {
      val ch = walk(t)
      assert(ch.map(_._2).sum === bytes.length)
      ch.dropRight(1).foreach(c => assert(
        c._2 >= GearChunker.BlockMinLen && c._2 <= GearChunker.BlockMaxLen))
    }
    // gear2 is its own md5 derivation, disjoint from pass 1's table
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest("gear2:0".getBytes("UTF-8"))
    var h2 = 0L
    (0 until 8).foreach(j => h2 = (h2 << 8) | (d(j) & 0xffL))
    assert(GearChunker.gearTable2(0) === h2)
    assert(GearChunker.gearTable2.toSeq !== GearChunker.gearTable.toSeq)
    // edges: empty text → no keys; sub-MinLen text → one chunk per pass,
    // two keys kept apart by the pass-2 tag
    assert(GearChunker.blockKeys(UTF8String.fromString("")).isEmpty)
    val tiny = GearChunker.blockKeys(UTF8String.fromString("abc"))
    assert(tiny.length === 2 && (tiny(0) ^ tiny(1)) === GearChunker.BlockSeed2Tag)
  }

  test("blockKeys: a scattered single-character edit preserves most keys") {
    // non-repeating tokens: a repeated phrase would leave the edited
    // chunk's CONTENT alive elsewhere in the key set and mask the change
    val text = (0 until 80).map(i => s"token${i}word$i").mkString(" ")
    val base = GearChunker.blockKeys(UTF8String.fromString(text)).toSet
    // one substitution mid-document: every chunk not containing the edit
    // (or a boundary inside its context window) keeps its key — the
    // pigeonhole complement to shingle destruction
    val edited = text.updated(text.length / 2, 'Q')
    val kept = GearChunker.blockKeys(UTF8String.fromString(edited)).count(base)
    assert(kept >= base.size - 6,
      s"a single edit should dirty at most ~2 chunks per pass, kept $kept/${base.size}")
    assert(kept < base.size, "the edited chunk's key must change")
  }

  test("doc_cdc_gear: the expression path matches the JVM function per doc") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.queries.DocQueries.cdcGear(spark, sf)
      .as[(Long, Int, Int, Int, Long)].collect().groupBy(_._1)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (id, rows) =>
      val exp = chunksOf(docs(id))
      assert(rows.sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq === exp.toSeq,
        s"doc $id")
    }
  }
}
