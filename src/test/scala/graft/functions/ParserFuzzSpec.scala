package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Hostile-string fuzzing for the per-row REQUEST parsers — query strings,
  * HTTP header values, URIs, X-Forwarded-For, and the uap-core YAML-subset
  * loader. All of these consume attacker-controlled bytes inside executors
  * (a collector's query string IS the wire), so the contract is the same as
  * the wire codecs': any malformed input degrades to the documented empty/
  * null/absent value — never a throw, never a JVM Error. */
class ParserFuzzSpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 500): Unit = {
    // Fixed seed: the gate must be reproducible round to round — a fresh
    // random seed finding a NEW counterexample should happen in a dev run
    // (bump the seed when hunting), never by surprise in the round gate.
    val seeded = SCTest.Parameters.default.withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(0x2aa1e45a4f75f07L))
    val r = SCTest.check(seeded, prop)
    assert(r.passed, r.status.toString)
  }

  private def noThrow(f: => Any): Boolean =
    try { f; true } catch { case _: Throwable => false }

  /** Strings biased toward each parser's control characters. */
  private def hostile(extra: Seq[Char]): Gen[String] = {
    val ch = Gen.oneOf(
      Gen.oneOf(extra),
      Gen.alphaNumChar,
      Gen.oneOf('%', '&', '=', '+', '"', '\\', ',', ':', '/', '?', '#',
        '[', ']', '@', ' ', '\t', '~', '!'),
      Gen.chooseNum(0, 0xFFFF).map(_.toChar))
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, ch).map(_.mkString))
  }

  test("query-string parse never throws; malformed escapes yield empty map") {
    check(Prop.forAll(hostile(Seq('%', '&', '='))) { s =>
      noThrow {
        val m = QueryStrings.parse(s)
        // contract: every key maps to non-null values
        m.forall { case (k, vs) => k != null && vs.forall(_ != null) }
      }
    })
    assert(QueryStrings.parse("a=%zz") === Map.empty) // malformed escape
    assert(QueryStrings.parse("a=%") === Map.empty)   // truncated escape
    assert(QueryStrings.parse(null) === Map.empty)
  }

  test("header-value split never throws; output list is non-null") {
    check(Prop.forAll(hostile(Seq('"', '\\', ','))) { s =>
      noThrow {
        val parts = HeaderValues.split(s)
        parts != null && parts.forall(_ != null)
      }
    })
    // unterminated quote / trailing escape — the RFC-7230 corner cases
    assert(noThrow(HeaderValues.split("\"unterminated")))
    assert(noThrow(HeaderValues.split("a,\"b\\")))
    // index access beyond range returns null, not a throw
    check(Prop.forAll(hostile(Seq(',')), Gen.chooseNum(-5, 5)) { (s, i) =>
      noThrow(HeaderValues.get(HeaderValues.split(s), i))
    }, n = 200)
  }

  test("uri parse never throws; invalid input yields the all-absent row") {
    check(Prop.forAll(hostile(Seq(':', '/', '?', '#', '[', ']', '@'))) { s =>
      noThrow(Uris.parseInternal(UTF8String.fromString(s)))
    })
    assert(noThrow(Uris.parseInternal(null)))
  }

  test("xff resolution and IP-literal parse never throw") {
    check(Prop.forAll(hostile(Seq('.', ':', ',', '[', ']'))) { s =>
      noThrow(PeerAddresses.resolveXff(s)) &&
      noThrow(PeerAddresses.parseIpLiteral(s))
    })
    assert(PeerAddresses.parseIpLiteral("999.1.1.1") === null)
    assert(PeerAddresses.parseIpLiteral("") === null)
  }

  test("uap-core YAML-subset loader fails controlled on corrupt rule files") {
    // LOADER-side contract (unlike the per-row parsers above): a corrupt
    // rule file may be REJECTED with an IllegalArgumentException — the
    // refresh path catches it and keeps serving the old database
    // (UaDatabaseStreamSpec pins that) — but must never terminate with a
    // JVM Error or anything other than the documented rejection.
    def controlled(f: => Any): Boolean =
      try { f; true } catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    check(Prop.forAll(hostile(Seq('-', ':', '\'', '\n', ' '))) { s =>
      controlled(UaDatabase.parseYamlSections(s))
    }, n = 300)
    // structured-but-wrong shapes
    assert(controlled(UaDatabase.parseYamlSections("user_agent_parsers:\n  - regex:")))
    assert(controlled(UaDatabase.parseYamlSections(":\n:\n:")))
  }
}
