package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-bytes fuzzing for the three hand-rolled wire codecs that parse
  * untrusted input inside executors — [[MediaCodec]], [[Mincode]], and
  * [[graft.sources.MaxMindDb]]. The contracts under test:
  *
  *  - per-ROW decoders (media containers, mincode event params) must
  *    return null on ANY malformed input — a throw would fail the task and
  *    a StackOverflowError would kill it (the decodeAvi-class bug family);
  *  - the LOADER-side mmdb reader may reject corrupt files with an
  *    Exception (that is its documented contract) but must never escalate
  *    to a JVM Error (stack overflow via pointer cycles / unbounded
  *    nesting) or fail to terminate.
  *
  * Three input families per codec: pure random bytes, truncations of a
  * valid encoding (every byte boundary is someone's disk corruption), and
  * single-byte mutations of a valid encoding (bit rot / torn writes). */
class CodecFuzzSpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 300): Unit = {
    // Fixed seed: the gate must be reproducible round to round — a fresh
    // random seed finding a NEW counterexample should happen in a dev run
    // (bump the seed when hunting), never by surprise in the round gate.
    val seeded = SCTest.Parameters.default.withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(0x23ee48f789b9b4aL))
    val r = SCTest.check(seeded, prop)
    assert(r.passed, r.status.toString)
  }

  /** Run `f`; pass iff it terminates without throwing ANYTHING. */
  private def noThrow(f: => Any): Boolean =
    try { f; true } catch { case t: Throwable => false }

  /** Run `f`; pass iff nothing worse than an Exception escapes (an Error —
    * StackOverflowError, OOM — is an executor-killer and always a bug). */
  private def noError(f: => Any): Boolean =
    try { f; true } catch {
      case _: Exception => true
      case _: Error => false
    }

  private val randomBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 4096).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  private def truncations(valid: Array[Byte]): Gen[Array[Byte]] =
    Gen.chooseNum(0, valid.length).map(valid.take)

  private def mutations(valid: Array[Byte]): Gen[Array[Byte]] = for {
    i <- Gen.chooseNum(0, valid.length - 1)
    b <- Gen.chooseNum(-128, 127).map(_.toByte)
  } yield { val c = valid.clone(); c(i) = b; c }

  // ------------------------------------------------------------ MediaCodec

  private val validBmp = MediaCodec.encodeBmp(13, 7, (x, y) => (x * 31 + y) & 0xffffff)
  private val validWav = MediaCodec.encodeWav(8000, 2,
    Array.tabulate(137)(i => ((i * 2654435761L) % 65536 - 32768).toShort))
  private val validAvi = MediaCodec.encodeAvi(6, 4, 40000,
    Seq.tabulate(3)(f => (x: Int, y: Int) => (f * 1000 + y * 6 + x) & 0xffffff))

  test("media decoders never throw on random bytes") {
    check(Prop.forAll(randomBytes) { b =>
      noThrow(MediaCodec.decodeBmp(b)) &&
      noThrow(MediaCodec.decodeWav(b)) &&
      noThrow(MediaCodec.decodeAvi(b))
    })
  }

  test("media decoders never throw on truncated valid files") {
    check(Prop.forAll(truncations(validBmp))(b => noThrow(MediaCodec.decodeBmp(b))))
    check(Prop.forAll(truncations(validWav))(b => noThrow(MediaCodec.decodeWav(b))))
    check(Prop.forAll(truncations(validAvi))(b => noThrow(MediaCodec.decodeAvi(b))))
  }

  test("media decoders never throw on single-byte mutations") {
    check(Prop.forAll(mutations(validBmp))(b => noThrow(MediaCodec.decodeBmp(b))))
    check(Prop.forAll(mutations(validWav))(b => noThrow(MediaCodec.decodeWav(b))))
    check(Prop.forAll(mutations(validAvi))(b => noThrow(MediaCodec.decodeAvi(b))))
  }

  // --------------------------------------------------------------- Mincode

  private val validMincode = Mincode.fromJson(
    """{"k":"v","n":12345,"neg":-9,"arr":[1,"two",null,true,{"deep":false}],
      |"esc":"a~b!c","f":1.5e-3}""".stripMargin.replace("\n", ""))

  test("mincode decode never throws on arbitrary strings, and any non-null " +
       "output is valid JSON") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val hostileChar = Gen.oneOf(
      Gen.oneOf('(', ')', 'a', '.', 's', 'd', 'j', 't', 'f', 'n', '!', '~'),
      Gen.alphaNumChar,
      Gen.chooseNum(0, 0xFFFF).map(_.toChar))
    val s = Gen.chooseNum(0, 256).flatMap(n =>
      Gen.listOfN(n, hostileChar).map(_.mkString))
    check(Prop.forAll(s) { str =>
      try {
        val out = Mincode.toJson(str)
        out == null || noThrow(mapper.readTree(out))
      } catch { case _: Throwable => false }
    }, n = 1000)
  }

  test("mincode decode never throws on mutations/truncations of a valid code") {
    val mut = for {
      i <- Gen.chooseNum(0, validMincode.length - 1)
      c <- Gen.oneOf('(', ')', 'a', '.', '!', '~', 'x', 'd')
      trunc <- Gen.chooseNum(0, validMincode.length)
    } yield validMincode.updated(i, c).take(trunc)
    check(Prop.forAll(mut)(s => noThrow(Mincode.toJson(s))), n = 1000)
  }

  test("pathological nesting returns null instead of StackOverflowError") {
    assert(Mincode.toJson("a" * 100000) == null)
    assert(Mincode.toJson("(" + ("(x!" * 100000)) == null)
    // right at the depth cap: still parses (bound is generous, not tight)
    val deepOk = ("a" * 500) + "t" + ("." * 500)
    val parsed = Mincode.toJson(deepOk)
    assert(parsed != null && parsed.contains("true"))
  }

  // -------------------------------------------------------------- MaxMindDb

  /** Minimal valid .mmdb via the production writer. */
  private val validMmdb: Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
    val schema = graft.sources.MaxMindDb.CityDimSchema
    val row = new GenericRowWithSchema(
      schema.fieldNames.map {
        case "ip_start" => 0x01020300L
        case "ip_end"   => 0x010203FFL
        case "city_name" => "Fuzzville"
        case "country_code" => "US"
        case "latitude" => 1.25
        case _ => null
      }.toArray[Any], schema)
    val tmp = java.io.File.createTempFile("fuzz", ".mmdb")
    try {
      graft.sources.MaxMindDbWriter.write(Seq(row), tmp.getAbsolutePath)
      graft.sources.MaxMindDb.readBytes(tmp.getAbsolutePath)
    } finally tmp.delete()
  }

  test("mmdb reader terminates with at worst an Exception on corrupt bytes") {
    // sanity: the seed itself loads
    assert(graft.sources.MaxMindDb.ipv4Networks(validMmdb).nonEmpty)
    def load(b: Array[Byte]): Unit = {
      graft.sources.MaxMindDb.metadata(b)
      graft.sources.MaxMindDb.ipv4Networks(b)
      ()
    }
    check(Prop.forAll(mutations(validMmdb))(b => noError(load(b))), n = 1000)
    check(Prop.forAll(truncations(validMmdb))(b => noError(load(b))))
  }

  test("a pointer cycle in the data section fails controlled, not with " +
       "StackOverflowError") {
    // hand-assembled: metadata map {"a": <pointer to the pointer itself>}
    // — the cycle a corrupt file can contain even though the spec forbids
    // pointer-to-pointer. Layout after the marker:
    //   0xE1        map, 1 entry
    //   0x41 'a'    key "a"
    //   0x20 0x03   pointer, 11-bit form, target = metadataStart + 3 (itself)
    val marker = Array(0xAB.toByte, 0xCD.toByte, 0xEF.toByte) ++
      "MaxMind.com".getBytes("UTF-8")
    val bytes = Array.fill[Byte](16)(0) ++ marker ++
      Array(0xE1.toByte, 0x41.toByte, 'a'.toByte, 0x20.toByte, 0x03.toByte)
    val r = scala.util.Try(graft.sources.MaxMindDb.metadata(bytes))
    assert(r.isFailure)
    assert(r.failed.get.isInstanceOf[Exception],
      s"expected a controlled Exception, got ${r.failed.get}")
  }
}
