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
