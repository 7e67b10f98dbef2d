package graft.functions

import scala.collection.mutable

/** RFC-7230-style header value splitting, matching the reference's
  * `recordmapping/HeaderValueParser.java` semantics:
  *  - values are comma-separated; empty values are skipped entirely;
  *  - quoted strings may contain commas and `\`-escapes (quotes dropped,
  *    escapes resolved);
  *  - runs of internal whitespace collapse to a single space; leading and
  *    trailing whitespace is trimmed.
  */
object HeaderValues {

  def split(headerValue: String): Seq[String] = {
    if (headerValue == null) return Nil
    val out = mutable.ArrayBuffer.empty[String]
    val n = headerValue.length
    var i = 0
    val piece = new java.lang.StringBuilder

    def skipWs(): Unit = while (i < n && (headerValue.charAt(i) == ' ' || headerValue.charAt(i) == '\t')) i += 1

    while (i < n) {
      piece.setLength(0)
      var done = false
      var wsPending = false
      skipWs()
      while (i < n && !done) {
        headerValue.charAt(i) match {
          case ',' =>
            i += 1; done = true
          case '"' =>
            i += 1
            // quoted-string: copy until closing quote, resolving \-escapes.
            // The pending-whitespace flush is LAZY (before the first actual
            // char): an empty "" must not flush — eager flushing left
            // 'a "" b' with a double space and 'a ""' with a trailing one
            var closed = false
            while (i < n && !closed) {
              headerValue.charAt(i) match {
                case '"' => i += 1; closed = true
                case '\\' if i + 1 < n =>
                  if (wsPending && piece.length > 0) piece.append(' ')
                  wsPending = false
                  piece.append(headerValue.charAt(i + 1)); i += 2
                case '\\' => i += 1
                case c =>
                  if (wsPending && piece.length > 0) piece.append(' ')
                  wsPending = false
                  piece.append(c); i += 1
              }
            }
          case ' ' | '\t' =>
            wsPending = true
            skipWs()
          case _ =>
            if (wsPending && piece.length > 0) piece.append(' ')
            wsPending = false
            val start = i
            while (i < n && !",\" \t".contains(headerValue.charAt(i))) i += 1
            piece.append(headerValue, start, i)
        }
      }
      if (piece.length > 0) out += piece.toString
    }
    out.toSeq
  }

  /** Positional get with negative-from-end semantics
    * (`DslRecordMapping.java:650-727`): `get(0)` = first, `get(-1)` = last. */
  def get(values: Seq[String], index: Int): String = {
    val i = if (index < 0) values.length + index else index
    if (i >= 0 && i < values.length) values(i) else null
  }
}
