package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import graft.model.DivolteId
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the pure codec layer — the coverage SURVEY.md
  * §5 notes the reference lacks (its tests are example-based): roundtrips
  * and never-throw guarantees over generated input. */
class PropertySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(r.passed, r.status.toString)
  }

  // ------------------------------------------------------------------ BPE
  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val ranksGen: Gen[Map[(String, String), Int]] =
    Gen.listOf(for {
      l <- Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString).flatMap(s =>
        Gen.oneOf(s.take(1), s))
      r <- Gen.listOfN(2, Gen.alphaLowerChar).map(_.mkString).flatMap(s =>
        Gen.oneOf(s.take(1), s, s + Bpe.EndOfWord))
    } yield (l, r)).map(_.distinct.zipWithIndex.toMap)

  test("BPE encode: symbols always reconstruct the word, under ANY rank map") {
    check(Prop.forAll(wordGen, ranksGen) { (w, ranks) =>
      Bpe.encodeWord(w, ranks).mkString.stripSuffix(Bpe.EndOfWord) == w
    })
  }

  test("BPE encode is idempotent: no mergeable pair survives encoding") {
    check(Prop.forAll(wordGen, ranksGen) { (w, ranks) =>
      val syms = Bpe.encodeWord(w, ranks)
      syms.length < 2 || syms.sliding(2).forall(p =>
        !ranks.contains((p(0), p(1))))
    })
  }

  test("BPE mergePair: fuses every non-overlapping occurrence, keeps mass") {
    check(Prop.forAll(wordGen, wordGen.map(_.take(2))) { (w, pair) =>
      val syms = Bpe.wordSymbols(w)
      val (l, r) = (pair.take(1), pair.drop(1))
      val merged = Bpe.mergePair(syms, l, if (r.isEmpty) l else r)
      merged.mkString == syms.mkString &&
        (merged.length <= syms.length)
    })
  }

  // ------------------------------------------------------- SQL tokenization
  test("sqlToks trims spaces only and keeps the SQL leading-empty token") {
    import graft.functions.MinHash.sqlToks
    // regression: String.trim also strips \t/\n/control chars, silently
    // diverging from the string_split_regex(trim(text), '\s+') oracles
    // DuckDB-verified: string_split_regex keeps \s-edge empties
    assert(sqlToks("\tfoo bar").toSeq === Seq("", "foo", "bar"))
    assert(sqlToks("  foo bar  ").toSeq === Seq("foo", "bar"))
    assert(sqlToks("foo\nbar\t").toSeq === Seq("foo", "bar", ""))
    assert(sqlToks("").toSeq === Seq(""))
    assert(sqlToks("   ").toSeq === Seq(""))
    assert(sqlToks("\t\n").toSeq === Seq("", ""))
    // \x0B is NOT whitespace to RE2 (the oracle's regex engine) — it must
    // stay inside the token, unlike java \s which would split on it
    assert(sqlToks("a\u000bb c").toSeq === Seq("a\u000bb", "c"))
    // the live engine-parity check (sqlToks vs the actual Spark column
    // split) is in PipelineSpec — a same-algorithm reference here would
    // be tautological
  }

  // --------------------------------------------------------------- base36
  test("base36 long/int roundtrip for every in-range value") {
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      DivolteId.tryParseBase36Long(java.lang.Long.toString(n, 36)) == n
    })
    check(Prop.forAll(Gen.chooseNum(0, Int.MaxValue)) { n =>
      DivolteId.tryParseBase36Int(java.lang.Integer.toString(n, 36)) == n
    })
  }

  test("base36 parse never throws, and out-of-range/malformed is null") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      DivolteId.tryParseBase36Long(s); DivolteId.tryParseBase36Int(s); true
    })
    // anything beyond Int range through the Int parser is null, not wrapped
    check(Prop.forAll(Gen.chooseNum(Int.MaxValue.toLong + 1, Long.MaxValue)) { n =>
      DivolteId.tryParseBase36Int(java.lang.Long.toString(n, 36)) == null
    })
  }

  // ------------------------------------------------------------ identifiers
  test("generated divolte ids parse back to their timestamp") {
    check(Prop.forAll(Gen.chooseNum(0L, 4294967295999L)) { ts =>
      val id = DivolteId.generate(ts)
      DivolteId.isValid(id) && DivolteId.timestampOf(id) == ts
    })
  }

  // ------------------------------------------------------------ query string
  private val keyGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val valGen = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '&', '=', '%', '+', 'ü', '語', '/')))
    .map(_.mkString)

  test("query strings roundtrip: render(url-encode) -> parse recovers pairs") {
    val pairsGen = Gen.nonEmptyListOf(Gen.zip(keyGen, valGen))
    check(Prop.forAll(pairsGen) { pairs =>
      val qs = pairs.map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      val parsed = QueryStrings.parse(qs)
      // every (k, ordered values) group must come back exactly
      pairs.groupBy(_._1).forall { case (k, kvs) =>
        parsed.get(k).exists(_ == kvs.map(_._2))
      }
    })
  }

  test("query-string parse never throws on arbitrary input") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s => QueryStrings.parse(s); true })
  }

  // ---------------------------------------------------------------- mincode
  private val jsonScalarGen: Gen[String] = Gen.oneOf(
    Gen.const("null"), Gen.const("true"), Gen.const("false"),
    Gen.chooseNum(Long.MinValue + 1, Long.MaxValue).map(_.toString),
    Gen.chooseNum(-1e9, 1e9).map(d => f"$d%.4f"),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '!', '~', '"', '\\', '(', ')', 'é')))
      .map(cs => mapper.writeValueAsString(cs.mkString)))

  private def jsonGen(depth: Int): Gen[String] =
    if (depth <= 0) jsonScalarGen
    else Gen.frequency(
      3 -> jsonScalarGen,
      1 -> Gen.listOf(Gen.lzy(jsonGen(depth - 1))).map(_.mkString("[", ",", "]")),
      1 -> Gen.listOf(Gen.zip(keyGen, Gen.lzy(jsonGen(depth - 1))))
        .map(kvs => kvs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")))

  test("mincode encode -> decode roundtrips arbitrary JSON trees") {
    check(Prop.forAll(jsonGen(3)) { json =>
      val decoded = Mincode.toJson(Mincode.fromJson(json))
      decoded != null && mapper.readTree(decoded) == mapper.readTree(json)
    })
  }

  test("mincode decode never throws on arbitrary input (null on malformed)") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s => Mincode.toJson(s); true })
  }

  // ----------------------------------------------------------------- headers
  test("header split: joined simple tokens recover; never throws on noise") {
    val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(Gen.nonEmptyListOf(token)) { ts =>
      HeaderValues.split(ts.mkString(", ")) == ts
    })
    check(Prop.forAll(Gen.asciiPrintableStr) { s => HeaderValues.split(s); true })
  }

  // ---------------------------------------------------------------- gear CDC
  test("gear chunks tile ANY byte string within the min/max bounds") {
    val bytesGen = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    check(Prop.forAll(bytesGen) { bs =>
      val ch = GearChunker.boundaries(bs)
      val tile = ch.map(_._2).sum == bs.length &&
        ch.foldLeft((true, 0)) { case ((ok, at), (st, ln)) =>
          (ok && st == at && ln > 0, st + ln) }._1
      val bounds = ch.dropRight(1).forall(c =>
        c._2 >= GearChunker.MinLen && c._2 <= GearChunker.MaxLen) &&
        ch.lastOption.forall(_._2 <= GearChunker.MaxLen)
      tile && bounds
    })
  }

  test("gear chunking of a shared suffix converges after a prefix edit") {
    val textGen = Gen.listOfN(600, Gen.alphaNumChar).map(_.mkString)
    val prefixGen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    check(Prop.forAll(textGen, prefixGen) { (t, p) =>
      val a = GearChunker.boundaries(t.getBytes("UTF-8"))
      // absolute boundary positions of the edited text, shifted back
      val pb = (p + t).getBytes("UTF-8")
      val b = GearChunker.boundaries(pb).map(_._1 - p.getBytes("UTF-8").length)
      // some boundary in the shared tail must realign (context is 21 bytes,
      // chunks cap at 128: re-sync happens within ~2 max chunks)
      val aTail = a.map(_._1).filter(_ >= 300).toSet
      aTail.isEmpty || b.exists(aTail.contains)
    })
  }

  // ---------------------------------------------------------------- t-digest
  test("t-digest: weight conserved, centroids sorted, quantiles in range, for ANY input") {
    val xsGen = Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6)).map(_.toArray)
    check(Prop.forAll(xsGen) { xs =>
      val flat = xs.flatMap(x => Array(x, 1.0))
      val dig = TDigest.compress(flat, xs.length, 50.0)
      val means = dig.indices.collect { case i if i % 2 == 0 => dig(i) }
      val w = TDigest.weight(dig)
      val q = Seq(0.0, 0.25, 0.5, 0.75, 1.0).map(TDigest.quantile(dig, _))
      math.abs(w - xs.length) < 1e-6 * xs.length.max(1) &&
        means.sameElements(means.sorted) &&
        q.forall(v => v >= xs.min - 1e-9 && v <= xs.max + 1e-9) &&
        q == q.sorted
    })
  }

  // ------------------------------------------------------------- unicode
  test("unicode normalization: idempotent and never throws on arbitrary strings") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(0x20, 0x2fff)).map(
      _.map(_.toChar).mkString)) { s =>
      Unicodes.nfc(Unicodes.nfc(s)) == Unicodes.nfc(s) &&
        Unicodes.nfkc(Unicodes.nfkc(s)) == Unicodes.nfkc(s)
    })
  }

  // ------------------------------------ exact-rational decision arithmetic
  // evt_fdr_bh and evt_changepoint promise that every decision is a
  // cross-multiplied INTEGER comparison valid within documented operand
  // bounds. These properties pin the bound claims: over the full
  // documented operating range the signed-64 arithmetic agrees with a
  // BigInt replay, so a future widening of the inputs that silently
  // overflows the longs fails here before it corrupts a gate.
  test("BH cross-multiplied compare matches BigInt over the documented range") {
    // bounds + q derived from EventQueries' constants so a change to either
    // re-runs the overflow check against the REAL operating parameters
    import graft.queries.EventQueries.{FdrQNum => qN, FdrQDen => qD,
      FdrOMax, FdrDMax, FdrMMax}
    val g = for {
      o <- Gen.chooseNum(0L, FdrOMax)
      dDays <- Gen.chooseNum(1L, FdrDMax)
      tTotal <- Gen.chooseNum(o, FdrOMax * FdrDMax) // type total >= the cell's own o
      m <- Gen.chooseNum(1L, FdrMMax)
      k <- Gen.chooseNum(1L, m)
    } yield (o, dDays, tTotal, m, k)
    check(Prop.forAll(g) { case (o, dd, tt, m, k) =>
      val dev = o * dd - tt
      val num = dev * dev
      val den = dd * tt
      val longDecision =
        if (num <= den) qD * m <= k * qN
        else den * qD * m <= num * k * qN
      val (bN, bD) = (BigInt(o) * dd - tt, BigInt(dd) * tt)
      val bigDecision =
        if (bN * bN <= bD) BigInt(qD) * m <= BigInt(k) * qN
        else bD * qD * m <= bN * bN * k * qN
      // the staged-division rank key must ALSO match BigInt here — the
      // single multiply den*1e9 overflows at den > 9.2e9, inside this range
      val keyOk =
        if (num <= den) true
        else {
          val key = ((den * 1000000L) / num) * 1000L +
            ((den * 1000000L) % num) * 1000L / num
          key == BigInt(den) * 1000000000 / (BigInt(dev) * dev)
        }
      longDecision == bigDecision && keyOk
    })
  }

  test("changepoint two-step quantized key matches BigInt over the documented domain") {
    // S_t <= S_n <= 4.5M events/type, n <= 400 days: dev^2 <= 3.3e18 and
    // the worst-case 1e3-scaled score (all mass on one edge day) stays
    // under 8.2e18 — the documented exactness domain of the two-step
    // (quotient*1e3 + remainder*1e3 DIV den) quantization, ANY series shape
    val g = for {
      n <- Gen.chooseNum(2L, 400L)
      t <- Gen.chooseNum(1L, n - 1)
      sN <- Gen.chooseNum(0L, 4500000L)
      sT <- Gen.chooseNum(0L, sN)
    } yield (n, t, sN, sT)
    check(Prop.forAll(g) { case (n, t, sN, sT) =>
      val dev = sT * n - t * sN
      val den = t * (n - t)
      val devB = BigInt(sT) * n - BigInt(t) * sN
      val keyB = devB * devB * 1000 / (BigInt(t) * (n - t))
      assert((devB * devB).isValidLong && keyB.isValidLong,
        "generator outside the documented domain")
      val key = (dev * dev / den) * 1000L + (dev * dev % den) * 1000L / den
      key == keyB // BigInt == Long compare promotes exactly
    })
  }
}
