package graft.functions

import graft.model.DivolteId
import org.scalatest.funsuite.AnyFunSuite

class QueryStringsSpec extends AnyFunSuite {
  test("basic multi-value semantics (QueryStringParser.java:37-89)") {
    assert(QueryStrings.parse("a=1&b=2") === Map("a" -> Seq("1"), "b" -> Seq("2")))
    assert(QueryStrings.parse("a=1&a=2") === Map("a" -> Seq("1", "2")))
    assert(QueryStrings.parse("flag&a=1") === Map("flag" -> Seq(""), "a" -> Seq("1")))
    assert(QueryStrings.parse("a=") === Map("a" -> Seq("")))
    assert(QueryStrings.parse("") === Map.empty)
    assert(QueryStrings.parse(null) === Map.empty)
  }
  test("later = belongs to the value") {
    assert(QueryStrings.parse("a=1=2") === Map("a" -> Seq("1=2")))
  }
  test("percent and plus decoding") {
    assert(QueryStrings.parse("k%20ey=v%26al&s=a+b") ===
      Map("k ey" -> Seq("v&al"), "s" -> Seq("a b")))
  }
  test("malformed escape yields empty map (reference returns emptyMap)") {
    assert(QueryStrings.parse("a=%zz") === Map.empty)
  }
}

class HeaderValuesSpec extends AnyFunSuite {
  test("comma splitting with whitespace normalization") {
    assert(HeaderValues.split("a, b ,c") === Seq("a", "b", "c"))
    assert(HeaderValues.split("  spaced   out  value , two") ===
      Seq("spaced out value", "two"))
  }
  test("empty values are skipped") {
    assert(HeaderValues.split("a,,b,") === Seq("a", "b"))
    assert(HeaderValues.split(",,,") === Nil)
    assert(HeaderValues.split("") === Nil)
  }
  test("quoted strings hold commas; escapes resolve; quotes drop") {
    assert(HeaderValues.split("\"a, b\", c") === Seq("a, b", "c"))
    assert(HeaderValues.split("\"esc\\\"aped\"") === Seq("esc\"aped"))
    assert(HeaderValues.split("pre \"mid\" post") === Seq("pre mid post"))
  }
  test("positional get with negative indices (DslRecordMapping.java:650-727)") {
    val vs = Seq("a", "b", "c")
    assert(HeaderValues.get(vs, 0) === "a")
    assert(HeaderValues.get(vs, 2) === "c")
    assert(HeaderValues.get(vs, -1) === "c")
    assert(HeaderValues.get(vs, -3) === "a")
    assert(HeaderValues.get(vs, 3) === null)
    assert(HeaderValues.get(vs, -4) === null)
  }
}

class DivolteIdSpec extends AnyFunSuite {
  test("generate/parse roundtrip embeds the timestamp") {
    val id = DivolteId.generate(1234567890123L)
    assert(id.startsWith("0:"))
    assert(DivolteId.timestampOf(id) === 1234567890123L)
    assert(DivolteId.isValid(id))
  }
  test("reference format example parses") {
    // 0:<base36 millis>:<base64url id> (DivolteIdentifier.java:55-61)
    val ts = java.lang.Long.parseLong("i0rjfnxd", 36)
    assert(DivolteId.timestampOf(s"0:i0rjfnxd:AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA") === ts)
  }
  test("malformed ids parse to null") {
    assert(DivolteId.timestampOf("1:i0rjfnxd:x") === null) // wrong version
    assert(DivolteId.timestampOf("0:not base36?!:x") === null)
    assert(DivolteId.timestampOf("0:abc") === null)        // 2 parts
    assert(DivolteId.timestampOf("") === null)
    assert(DivolteId.timestampOf(null) === null)
    // 4 parts: reference splitter (limit 4) yields size 4 != 3 => invalid
    assert(DivolteId.timestampOf("0:1:a:b") === null)
  }
  test("base36 tryParse: null on overflow/malformed, not wraparound") {
    assert(DivolteId.tryParseBase36Long("zzzzzzzzzzzzzzzzzz") === null) // > Long.Max
    assert(DivolteId.tryParseBase36Long("-1") === -1L)
    assert(DivolteId.tryParseBase36Long("zz") === 1295L)
    assert(DivolteId.tryParseBase36Int("zz") === 1295)
    assert(DivolteId.tryParseBase36Int("zzzzzzzz") === null) // > Int.Max
  }
}

class DigestsSpec extends AnyFunSuite {
  test("plain digest equals direct MessageDigest over concatenated bytes") {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.update("ab".getBytes("UTF-8")); md.update("cd".getBytes("UTF-8"))
    assert(Digests.digest("SHA-256", Array("ab", "cd")).toSeq === md.digest().toSeq)
  }
  test("absent pieces contribute no bytes (Digester.java:61-78)") {
    assert(Digests.digest("MD5", Array("ab", null, "cd")).toSeq ===
      Digests.digest("MD5", Array("abcd")).toSeq)
  }
  test("result is always present even with all pieces absent") {
    assert(Digests.digest("SHA-1", Array(null, null)).toSeq ===
      Digests.digest("SHA-1", Array.empty[String]).toSeq)
  }
  test("seeded digest is an HMAC: differs by seed, deterministic per seed") {
    val a1 = Digests.hmacDigest("SHA-256", "seed-a", Array("payload"))
    val a2 = Digests.hmacDigest("SHA-256", "seed-a", Array("payload"))
    val b = Digests.hmacDigest("SHA-256", "seed-b", Array("payload"))
    assert(a1.toSeq === a2.toSeq)
    assert(a1.toSeq !== b.toSeq)
    assert(a1.length === 32)
  }
}
