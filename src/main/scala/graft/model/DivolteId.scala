package graft.model

import java.security.SecureRandom
import java.util.Base64

/** Divolte identifier codec: `"0:<base36 epoch-millis>:<base64url 24 random
  * bytes>"` — versioned, with an embedded creation timestamp.
  *
  * Behavior per reference `src/main/java/io/divolte/server/DivolteIdentifier.java:35-102`:
  *  - version char is `'0'`; parse accepts exactly 3 `:`-separated parts;
  *  - timestamp is `Long.toString(ts, 36)` (lowercase) and parses with
  *    `Long.parseLong(_, 36)` (case-insensitive, `+`/`-` allowed);
  *  - malformed input parses to None (never throws).
  */
object DivolteId {
  final val Version = '0'

  /** Static helpers are called from Catalyst StaticInvoke expressions — they
    * must be null-tolerant and exception-free. */
  def timestampOf(value: String): java.lang.Long = {
    if (value == null) return null
    // split(":", 4) mirrors the reference's Guava Splitter.on(':').limit(4)
    // EXACTLY — both keep trailing empty parts ("0:1b2m:" parses to 3 parts
    // and is ACCEPTED with an empty id; "0:x:y:" makes 4 and is rejected).
    // Do not "fix" this to Java's limit-0 split, which drops trailing
    // empties and flips both classifications.
    val parts = value.split(":", 4)
    if (parts.length != 3 || parts(0) != "0") return null
    try java.lang.Long.valueOf(java.lang.Long.parseLong(parts(1), 36))
    catch { case _: NumberFormatException => null }
  }

  def isValid(value: String): Boolean = timestampOf(value) != null

  private val localRandom = ThreadLocal.withInitial[SecureRandom](() => new SecureRandom)

  /** Mint a new identifier (reference `DivolteIdentifier.java:94-102`):
    * 24 random bytes, base64url *with* padding (JS uses unpadded; the server
    * uses `Base64.getUrlEncoder()` which pads — we follow the server). */
  def generate(tsMillis: Long): String = {
    val bytes = new Array[Byte](24)
    localRandom.get().nextBytes(bytes)
    s"$Version:${java.lang.Long.toString(tsMillis, 36)}:${Base64.getUrlEncoder.encodeToString(bytes)}"
  }

  def tryParseBase36Long(s: String): java.lang.Long = {
    if (s == null) return null
    try java.lang.Long.valueOf(java.lang.Long.parseLong(s, 36))
    catch { case _: NumberFormatException => null }
  }

  def tryParseBase36Int(s: String): java.lang.Integer = {
    if (s == null) return null
    try java.lang.Integer.valueOf(java.lang.Integer.parseInt(s, 36))
    catch { case _: NumberFormatException => null }
  }
}
