package graft.functions

import graft.model.DivolteId

/** One-pass JVM decode of the browser GET-pixel wire format — the hot-path
  * form of the column-expression pipeline in
  * [[graft.sources.BrowserSource]]. The column formulation evaluated the
  * parsed map through interpreted higher-order functions (checksum
  * canonicalization) plus an O(keys) map lookup per projected field;
  * measured 8.4k events/s/core. This single function does query-string
  * parse, checksum, base36, flags and mincode in one pass over the string.
  *
  * Semantics are IDENTICAL to the expression path (same absent-as-null
  * rules, same canonicalization, same tryParse) — asserted by SourcesSpec
  * and the dsl_default_mapping / src_browser_roundtrip oracles.
  */
object BrowserWire {

  final case class BrowserInfo(
      pageViewId: Option[String], location: Option[String], referer: Option[String],
      viewportPixelWidth: Option[Int], viewportPixelHeight: Option[Int],
      screenPixelWidth: Option[Int], screenPixelHeight: Option[Int],
      devicePixelRatio: Option[Int])

  final case class Decoded(
      corrupt: Boolean,
      partyId: Option[String], sessionId: Option[String], eventId: Option[String],
      eventSource: String, eventType: Option[String],
      newPartyId: Option[Boolean], firstInSession: Option[Boolean],
      clientTime: Option[Long], partyIdTime: Option[Long], sessionIdTime: Option[Long],
      eventParameters: Option[String], browser: BrowserInfo)

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  /** Catalyst schema of [[decodeInternal]]'s row (field order fixed). */
  val schema: StructType = StructType(Seq(
    StructField("corrupt", BooleanType, nullable = false),
    StructField("partyId", StringType),
    StructField("sessionId", StringType),
    StructField("eventId", StringType),
    StructField("eventSource", StringType, nullable = false),
    StructField("eventType", StringType),
    StructField("newPartyId", BooleanType),
    StructField("firstInSession", BooleanType),
    StructField("clientTime", LongType),
    StructField("partyIdTime", LongType),
    StructField("sessionIdTime", LongType),
    StructField("eventParameters", StringType),
    StructField("browser", StructType(Seq(
      StructField("pageViewId", StringType),
      StructField("location", StringType),
      StructField("referer", StringType),
      StructField("viewportPixelWidth", IntegerType),
      StructField("viewportPixelHeight", IntegerType),
      StructField("screenPixelWidth", IntegerType),
      StructField("screenPixelHeight", IntegerType),
      StructField("devicePixelRatio", IntegerType))), nullable = false)))

  private val BrowserSourceTag = UTF8String.fromString("browser")

  /** Hot path: decode straight into a Catalyst InternalRow — skips the
    * reflective case-class serializer entirely (~3x on the decode stage). */
  def decodeInternal(qs: UTF8String): InternalRow = {
    // null qs (a frame with no query string at all) decodes like an
    // unparseable one: corrupt-flagged, every field absent — the decoder
    // is the null guard so the expression can stay non-nullable
    val d = decode(if (qs == null) "" else qs.toString)
    def s(v: Option[String]): AnyRef = v.map(UTF8String.fromString).orNull
    def j(v: Option[_]): AnyRef = v.map(_.asInstanceOf[AnyRef]).orNull
    val b = d.browser
    new GenericInternalRow(Array[Any](
      d.corrupt, s(d.partyId), s(d.sessionId), s(d.eventId), BrowserSourceTag,
      s(d.eventType), j(d.newPartyId), j(d.firstInSession), j(d.clientTime),
      j(d.partyIdTime), j(d.sessionIdTime), s(d.eventParameters),
      new GenericInternalRow(Array[Any](
        s(b.pageViewId), s(b.location), s(b.referer),
        j(b.viewportPixelWidth), j(b.viewportPixelHeight),
        j(b.screenPixelWidth), j(b.screenPixelHeight), j(b.devicePixelRatio)))))
  }

  def decode(qs: String): Decoded = {
    val params = QueryStrings.parse(qs)
    def first(k: String): Option[String] = params.get(k).flatMap(_.headOption)
    def flag(k: String): Option[Boolean] = first(k).map(_ == "t")
    def b36i(k: String): Option[Int] =
      first(k).flatMap(s => Option(DivolteId.tryParseBase36Int(s)).map(_.intValue))
    def idTime(k: String): Option[Long] =
      first(k).flatMap(s => Option(DivolteId.timestampOf(s)).map(_.longValue))

    // checksum: canonical sorted-key string, all but 'x'
    // (ClientSideCookieEventHandler.java:241-261)
    val canonical = new java.lang.StringBuilder(qs.length + 16)
    params.keysIterator.toArray.sorted.foreach { k =>
      if (k != "x") {
        canonical.append(k).append('=')
        params(k).foreach(v => canonical.append(v).append(','))
        canonical.append(';')
      }
    }
    val actual = Murmur3.hash32(
      canonical.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toLong
    val expected = first("x").flatMap(s =>
      Option(DivolteId.tryParseBase36Long(s)).map(_.longValue))
    val corrupt = !expected.contains(actual)

    Decoded(
      corrupt = corrupt,
      partyId = first("p"), sessionId = first("s"), eventId = first("e"),
      eventSource = "browser", eventType = first("t"),
      newPartyId = flag("n"), firstInSession = flag("f"),
      clientTime = first("c").flatMap(s =>
        Option(DivolteId.tryParseBase36Long(s)).map(_.longValue)),
      partyIdTime = idTime("p"), sessionIdTime = idTime("s"),
      eventParameters = first("u").flatMap(u => Option(Mincode.toJson(u))),
      browser = BrowserInfo(
        pageViewId = first("v"), location = first("l"), referer = first("r"),
        viewportPixelWidth = b36i("w"), viewportPixelHeight = b36i("h"),
        screenPixelWidth = b36i("i"), screenPixelHeight = b36i("j"),
        devicePixelRatio = b36i("k")))
  }
}
