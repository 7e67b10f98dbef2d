package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Decoder behavior per the documented wire format
  * (`resources/divolte.js:893-917`); cases mirror the reference's
  * mincode sample corpus semantics. */
class MincodeSpec extends AnyFunSuite {

  private def json(code: String): String = Mincode.toJson(code)

  test("scalar records") {
    assert(json("sa string!") === "\"a string\"")
    assert(json("t") === "true")
    assert(json("f") === "false")
    assert(json("n") === "null")
    assert(json("d16!") === "42")         // base36
    assert(json("d-11!") === "-37")
    assert(json("j10.3!") === "10.3")
    assert(json("j-78.3e-10!") === "-78.3e-10")
  }

  test("escaping: ~ prefixes literal ! and ~") {
    assert(json("sHello~~World~!!") === "\"Hello~World!\"")
  }

  test("objects and arrays") {
    assert(json("()") === "{}")
    assert(json("a.") === "[]")
    assert(json("(sfoo!bar!sbaz!daz!)") === """{"foo":"bar","baz":"daz"}""")
    assert(json("asfoo!sbar!sbaz!sdaz!.") === """["foo","bar","baz","daz"]""")
    assert(json("a(sfoo!bar!)(ddaz!2!ddoo!3!).") ===
      """[{"foo":"bar"},{"daz":2,"doo":3}]""")
    assert(json("(sname!John Doe!dage!16!achildren!sMary!sBill!.)") ===
      """{"name":"John Doe","age":42,"children":["Mary","Bill"]}""")
  }

  test("deeply mixed document") {
    assert(json("((a!)sb!c!(d!aa!.sb!g!)ae!s1!s2!.df!16!jg!53.2!dh!-11!tj!fk!nl!)") ===
      """{"a":{},"b":"c","d":{"a":[],"b":"g"},"e":["1","2"],"f":42,"g":53.2,"h":-37,"j":true,"k":false,"l":null}""")
  }

  test("malformed input decodes to null, not an exception") {
    assert(json("s unterminated") === null)
    assert(json("dxyz~!") === null)       // bad base36 (escape not allowed in raw)
    assert(json("(sfoo!bar!") === null)   // unclosed object
    assert(json("q") === null)            // unknown record type
    assert(json("tt") === null)           // trailing garbage
    assert(json("jnot-a-number!") === null)
    assert(json(null) === null)
  }

  test("json strings are correctly escaped") {
    assert(json("sline1\nline2!") === "\"line1\\nline2\"")
    assert(json("squote\"backslash\\!") === "\"quote\\\"backslash\\\\\"")
  }
}

/** Replay of the reference's full mincode sample corpus
  * (`src/test/resources/io/divolte/server/mincode/mincode-samples.json`,
  * the fixture behind `MincodeParserSamplesTest.java`): every
  * {title, json, code} pair is driven BOTH directions — decode(code) must
  * parse to the identical JSON tree, and encode(json) must emit the
  * byte-identical code — pinning wire compatibility with the reference's
  * own test vectors rather than a home-grown corpus. */
class MincodeSamplesSpec extends AnyFunSuite {
  private val SamplesPath =
    "/root/reference/src/test/resources/io/divolte/server/mincode/mincode-samples.json"

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  mapper.configure(
    com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_COMMENTS, true)

  private lazy val samples: Seq[(String, com.fasterxml.jackson.databind.JsonNode, String)] = {
    val root = mapper.readTree(new java.io.File(SamplesPath))
    import scala.jdk.CollectionConverters._
    root.elements().asScala.map { n =>
      (n.path("title").asText("N/A"), n.get("json"), n.get("code").asText())
    }.toSeq
  }

  /** The RAW source text of each sample's "json" value, by stream offsets —
    * a tree re-serialization canonicalizes number literals (-78.3e-10
    * becomes -7.83E-9) while the wire code preserves the author's text, so
    * byte-exact encode comparison needs the original literal. */
  private lazy val rawJsonTexts: Seq[String] = {
    val src = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(SamplesPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val p = mapper.createParser(src)
    import com.fasterxml.jackson.core.JsonToken._
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var tok = p.nextToken()
    while (tok != null) {
      tok match {
        case START_OBJECT | START_ARRAY => depth += 1
        case END_OBJECT | END_ARRAY => depth -= 1
        case FIELD_NAME if depth == 2 && p.currentName() == "json" =>
          p.nextToken()
          val start = p.currentTokenLocation().getCharOffset.toInt
          p.skipChildren() // no-op for scalars; consumes nested containers
          p.finishToken() // strings/numbers are read lazily; complete them
          val end = p.currentLocation().getCharOffset.toInt
          out += src.substring(start, end).trim.stripSuffix(",").trim
        case _ =>
      }
      tok = p.nextToken()
    }
    out.toSeq
  }

  test("sample corpus is present and non-trivial") {
    assert(samples.size >= 15)
  }

  test("decode: every sample's code parses to the sample's JSON tree") {
    samples.foreach { case (title, jsonNode, code) =>
      val decoded = Mincode.toJson(code)
      assert(decoded != null, s"$title: decode returned null for $code")
      assert(mapper.readTree(decoded) === jsonNode,
        s"$title: decode($code) = $decoded, expected $jsonNode")
    }
  }

  test("encode: every sample's raw JSON text emits the byte-identical code") {
    assert(rawJsonTexts.size === samples.size)
    samples.zip(rawJsonTexts).foreach { case ((title, jsonNode, code), raw) =>
      assert(mapper.readTree(raw) === jsonNode, s"$title: raw-text extraction")
      val encoded = Mincode.fromJson(raw)
      assert(encoded === code, s"$title: encode mismatch")
    }
  }
}

/** Encoder + decoder roundtrip over randomized JSON documents. */
class MincodeRoundtripSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val rng = new scala.util.Random(2026)

  private def randomScalar(): String = rng.nextInt(6) match {
    case 0 => "null"
    case 1 => rng.nextBoolean().toString
    case 2 => rng.nextLong().toString
    case 3 => (rng.nextDouble() * 1000 - 500).toString
    case 4 => mapper.writeValueAsString(
      String.valueOf(Array.fill(rng.nextInt(12))((32 + rng.nextInt(95)).toChar)))
    case 5 => mapper.writeValueAsString("esc~!" + rng.nextInt(10))
  }

  private def randomJson(depth: Int): String =
    if (depth == 0) randomScalar()
    else rng.nextInt(3) match {
      case 0 => randomScalar()
      case 1 => (0 until rng.nextInt(4)).map(_ => randomJson(depth - 1))
        .mkString("[", ",", "]")
      case 2 => (0 until rng.nextInt(4)).map(i =>
        mapper.writeValueAsString(s"k$i${if (rng.nextBoolean()) "~!" else ""}") +
          ":" + randomJson(depth - 1)).mkString("{", ",", "}")
    }

  test("encoder spec examples match the sample corpus") {
    assert(Mincode.fromJson("\"a string\"") === "sa string!")
    assert(Mincode.fromJson("42") === "d16!")
    assert(Mincode.fromJson("10.3") === "j10.3!")
    assert(Mincode.fromJson("""{"name":"John Doe","age":42,"children":["Mary","Bill"]}""")
      === "(sname!John Doe!dage!16!achildren!sMary!sBill!.)")
    assert(Mincode.fromJson("\"Hello~World!\"") === "sHello~~World~!!")
  }

  test("500 random documents roundtrip encode -> decode -> identical JSON") {
    (1 to 500).foreach { _ =>
      val doc = randomJson(3)
      val code = Mincode.fromJson(doc)
      val back = Mincode.toJson(code)
      assert(back != null, s"decode failed for doc=$doc code=$code")
      assert(mapper.readTree(back) === mapper.readTree(doc),
        s"roundtrip mismatch: doc=$doc code=$code back=$back")
    }
  }
}
