package graft.functions

/** X-Forwarded-For peer-address resolution — the reference's
  * `ProxyAdjacentPeerAddressHandler.java:40-59`, which runs BEFORE any
  * mapping: the proxy-adjacent hop (the entry after the LAST comma of the
  * last `X-Forwarded-For` header) replaces the transport source address,
  * and an unparseable entry leaves the transport address untouched.
  *
  * [[resolveXff]] returns the normalized IP literal or null; callers
  * compose the reference's keep-old-on-failure with a plain
  * `coalesce(resolveXff(xff), remoteHost)` so the fallback stays in
  * whole-stage codegen.
  *
  * One deliberate divergence from `InetAddress.getByName`: the reference
  * would DNS-resolve a HOSTNAME in the header (blocking the accept thread
  * per request); a data engine cannot do per-row DNS, so only IP literals
  * resolve and hostnames fall through to the transport address — the
  * standard behavior for every XFF entry a real proxy writes.
  * Normalization parity is exact for literals: parsed bytes are formatted
  * by `InetAddress.getByAddress(...).getHostAddress` (no lookup), so
  * `::FFFF:1.2.3.4` → `1.2.3.4` and `2001:db8::1` →
  * `2001:db8:0:0:0:0:0:1` exactly as the reference's
  * `InetSocketAddress(getByName(v), 0).getHostString` would.
  */
object PeerAddresses {

  /** Rightmost XFF entry → normalized IP literal, or null when the header
    * is null/blank or the entry is not a valid IP literal. */
  def resolveXff(s: String): String = {
    if (s == null) return null
    val idx = s.lastIndexOf(',')
    val v = (if (idx == -1) s else s.substring(idx + 1)).trim
    val bytes = parseIpLiteral(v)
    if (bytes == null) null
    else java.net.InetAddress.getByAddress(bytes).getHostAddress
  }

  /** Strict IP-literal parser: dotted-quad IPv4 (decimal, 0-255, leading
    * zeros rejected — the octal ambiguity trap) or RFC-4291 IPv6 with `::`
    * compression, optional v4 tail, optional brackets (getByName accepts
    * `[::1]`). Returns 4 or 16 bytes, or null. Never touches the network. */
  def parseIpLiteral(s0: String): Array[Byte] = {
    if (s0 == null || s0.isEmpty) return null
    var s = s0
    if (s.length >= 2 && s.charAt(0) == '[' && s.charAt(s.length - 1) == ']')
      s = s.substring(1, s.length - 1)
    if (s.indexOf(':') >= 0) parseIpv6(s) else parseIpv4(s)
  }

  private def parseIpv4(s: String): Array[Byte] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return null
    val out = new Array[Byte](4)
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3) return null
      if (p.length > 1 && p.charAt(0) == '0') return null
      var v = 0
      var j = 0
      while (j < p.length) {
        val c = p.charAt(j)
        if (c < '0' || c > '9') return null
        v = v * 10 + (c - '0')
        j += 1
      }
      if (v > 255) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  private def parseIpv6(s: String): Array[Byte] = {
    if (s.isEmpty || s.indexOf('%') >= 0) return null
    val dcol = s.indexOf("::")
    if (dcol >= 0 && s.indexOf("::", dcol + 1) >= 0) return null
    // group values as 16-bit ints; a v4 tail expands to two groups and is
    // only legal as the FINAL token of the whole address (atEnd)
    def groups(part: String, atEnd: Boolean): Array[Int] = {
      if (part.isEmpty) return Array.empty
      val toks = part.split(":", -1)
      val buf = new Array[Int](toks.length + 1)
      var n = 0
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.isEmpty) return null // a stray ':' — only '::' may elide
        if (t.indexOf('.') >= 0) {
          if (!atEnd || i != toks.length - 1) return null
          val v4 = parseIpv4(t)
          if (v4 == null) return null
          buf(n) = ((v4(0) & 0xff) << 8) | (v4(1) & 0xff); n += 1
          buf(n) = ((v4(2) & 0xff) << 8) | (v4(3) & 0xff); n += 1
        } else {
          if (t.length > 4) return null
          var v = 0
          var j = 0
          while (j < t.length) {
            val d = Character.digit(t.charAt(j), 16)
            if (d < 0) return null
            v = (v << 4) | d
            j += 1
          }
          buf(n) = v; n += 1
        }
        i += 1
      }
      java.util.Arrays.copyOf(buf, n)
    }
    val head = groups(if (dcol < 0) s else s.substring(0, dcol), atEnd = dcol < 0)
    if (head == null) return null
    val tail = if (dcol < 0) null else groups(s.substring(dcol + 2), atEnd = true)
    if (dcol >= 0 && tail == null) return null
    val total = head.length + (if (tail == null) 0 else tail.length)
    val out = new Array[Byte](16)
    def put(g: Array[Int], at: Int): Unit = {
      var i = 0
      while (i < g.length) {
        out(2 * (at + i)) = (g(i) >> 8).toByte
        out(2 * (at + i) + 1) = g(i).toByte
        i += 1
      }
    }
    if (dcol < 0) {
      if (total != 8) return null
      put(head, 0)
    } else {
      if (total > 7) return null // '::' must elide at least one group
      put(head, 0)
      if (tail != null) put(tail, 8 - tail.length)
    }
    out
  }
}
