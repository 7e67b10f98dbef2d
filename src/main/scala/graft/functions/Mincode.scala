package graft.functions

/** Decoder for the reference's "mincode" compact wire format for event
  * parameters (spec: reference `src/main/resources/divolte.js:893-917`;
  * server-side parser `mincode/MincodeParser.java`). Re-implemented from the
  * documented format, emitting a JSON string for downstream `from_json` /
  * `get_json_object`.
  *
  * Record grammar:
  *  - type char, then (inside an object) the `!`-terminated escaped property
  *    name, then a record-specific payload;
  *  - `s` string (escaped, `!`-terminated)  `t`/`f` true/false  `n` null
  *  - `d` base36 long (`!`-terminated)      `j` raw JSON number (`!`-terminated)
  *  - `(` … `)` object                      `a` … `.` array
  *  - escaping within strings/names: `~` prefixes a literal `!` or `~`.
  *
  * Malformed input yields `null` (the reference's corrupt-tolerant stance:
  * bad event parameters must not kill the pipeline).
  */
object Mincode {

  def toJson(code: String): String = {
    if (code == null) return null
    try {
      val p = new Parser(code)
      val sb = new java.lang.StringBuilder(code.length * 2)
      p.parseValue(p.readType(), sb)
      if (!p.atEnd) null else sb.toString
    } catch { case _: MincodeError => null }
  }

  private final class MincodeError extends RuntimeException(null, null, false, false)

  // ------------------------------------------------------------- encoder
  /** JSON → mincode (the client-side direction, `divolte.js:918-1040`):
    * lets the engine mint reference-compatible wire payloads and enables
    * roundtrip testing of the decoder. Integral numbers that fit a long use
    * the compact base36 `d` record; everything else numeric uses the raw
    * JSON `j` record.
    *
    * Streams the JSON tokens rather than building a tree: a tree node
    * canonicalizes number literals (`-78.3e-10` would re-emit as
    * `-7.83E-9`), while the `j` record — like the decoder's — carries the
    * author's exact text; the streaming parser's `getText` preserves it
    * (MincodeSamplesSpec pins byte-parity on the reference's sample
    * corpus). */
  def fromJson(json: String): String = {
    import com.fasterxml.jackson.core.JsonToken._
    val p = jsonFactory.createParser(json)
    val sb = new java.lang.StringBuilder(json.length)
    var pendingName: String = null
    // the record's type char comes first, then (inside an object) the
    // `!`-terminated field name, then the payload
    def prefix(typeChar: Char): Unit = {
      sb.append(typeChar)
      if (pendingName != null) {
        sb.append(escape(pendingName)).append('!')
        pendingName = null
      }
    }
    var tok = p.nextToken()
    while (tok != null) {
      tok match {
        case FIELD_NAME         => pendingName = p.currentName()
        case START_OBJECT       => prefix('(')
        case END_OBJECT         => sb.append(')')
        case START_ARRAY        => prefix('a')
        case END_ARRAY          => sb.append('.')
        case VALUE_NULL         => prefix('n')
        case VALUE_TRUE         => prefix('t')
        case VALUE_FALSE        => prefix('f')
        case VALUE_STRING       =>
          prefix('s'); sb.append(escape(p.getText)).append('!')
        case VALUE_NUMBER_INT
            if p.getNumberType != com.fasterxml.jackson.core.JsonParser.NumberType.BIG_INTEGER =>
          prefix('d')
          sb.append(java.lang.Long.toString(p.getLongValue, 36)).append('!')
        case VALUE_NUMBER_INT | VALUE_NUMBER_FLOAT =>
          // raw JSON number, exact source text
          prefix('j'); sb.append(p.getText).append('!')
        case other => throw new IllegalArgumentException(s"unencodable token: $other")
      }
      tok = p.nextToken()
    }
    p.close()
    sb.toString
  }

  private val jsonFactory = new com.fasterxml.jackson.core.JsonFactory()

  private def escape(s: String): String =
    s.replace("~", "~~").replace("!", "~!")

  private final class Parser(in: String) {
    private var pos = 0
    /** Nesting guard: hostile input like "(((((…" recurses once per level;
      * unbounded it would kill the executor thread with StackOverflowError
      * instead of the contract's null. 512 is far above any real event
      * payload and far below JVM stack limits. */
    private var depth = 0
    private val MaxDepth = 512
    def atEnd: Boolean = pos >= in.length
    private def fail(): Nothing = throw new MincodeError

    def readType(): Char = {
      if (atEnd) fail()
      val c = in.charAt(pos); pos += 1; c
    }

    /** Read an escaped, '!'-terminated text segment (string value or name). */
    private def readText(): String = {
      val sb = new java.lang.StringBuilder()
      while (true) {
        if (atEnd) fail()
        val c = in.charAt(pos); pos += 1
        c match {
          case '!' => return sb.toString
          case '~' =>
            if (atEnd) fail()
            val esc = in.charAt(pos); pos += 1
            if (esc != '!' && esc != '~') fail()
            sb.append(esc)
          case other => sb.append(other)
        }
      }
      throw new IllegalStateException
    }

    /** Raw '!'-terminated segment with no escapes (numbers). */
    private def readRaw(): String = {
      val end = in.indexOf('!', pos)
      if (end < 0) fail()
      val s = in.substring(pos, end)
      pos = end + 1
      s
    }

    def parseValue(recordType: Char, out: java.lang.StringBuilder): Unit = recordType match {
      case 's' => writeJsonString(readText(), out)
      case 't' => out.append("true")
      case 'f' => out.append("false")
      case 'n' => out.append("null")
      case 'd' =>
        val raw = readRaw()
        try out.append(java.lang.Long.parseLong(raw, 36))
        catch { case _: NumberFormatException => fail() }
      case 'j' =>
        val raw = readRaw()
        if (!raw.matches("""-?\d+(\.\d+)?([eE][+-]?\d+)?""")) fail()
        out.append(raw)
      case '(' =>
        depth += 1
        if (depth > MaxDepth) fail()
        parseObject(out)
        depth -= 1
      case 'a' =>
        depth += 1
        if (depth > MaxDepth) fail()
        parseArray(out)
        depth -= 1
      case _   => fail()
    }

    private def parseObject(out: java.lang.StringBuilder): Unit = {
      out.append('{')
      var first = true
      while (true) {
        val t = readType()
        if (t == ')') { out.append('}'); return }
        if (!first) out.append(',')
        first = false
        writeJsonString(readText(), out) // property name precedes the payload
        out.append(':')
        parseValue(t, out)
      }
    }

    private def parseArray(out: java.lang.StringBuilder): Unit = {
      out.append('[')
      var first = true
      while (true) {
        val t = readType()
        if (t == '.') { out.append(']'); return }
        if (!first) out.append(',')
        first = false
        parseValue(t, out)
      }
    }
  }

  private def writeJsonString(s: String, out: java.lang.StringBuilder): Unit = {
    out.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => out.append("\\\"")
        case '\\' => out.append("\\\\")
        case '\b' => out.append("\\b")
        case '\f' => out.append("\\f")
        case '\n' => out.append("\\n")
        case '\r' => out.append("\\r")
        case '\t' => out.append("\\t")
        case ctrl if ctrl < ' ' => out.append(f"\\u${ctrl.toInt}%04x")
        case other => out.append(other)
      }
      i += 1
    }
    out.append('"')
  }
}
