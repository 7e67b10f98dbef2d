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
