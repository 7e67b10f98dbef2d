package graft.functions

/** User-agent classification — the engine's stand-in for the reference's
  * uadetector-backed enrichment (`recordmapping/UserAgentParserAndCache
  * .java:40-88`; producers `DslRecordMapping.java:331-402`). uadetector is a
  * discontinued library; this implements the same *output surface* (name,
  * family, vendor, type, version, device category, OS family/version/vendor)
  * with transparent regex heuristics over public UA-string conventions.
  *
  * Parse-once-per-row is preserved by exposing the result as a single struct
  * (the reference memoizes for the same reason,
  * `DslRecordMapping.java:340`).
  */
object UserAgents {

  final case class UaInfo(
      name: String, family: String, vendor: String, uaType: String,
      version: String, deviceCategory: String,
      osFamily: String, osVersion: String, osVendor: String)

  import org.apache.spark.sql.types.{StringType, StructField, StructType}
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

  val schema: StructType = StructType(Seq(
    "name", "family", "vendor", "uaType", "version", "deviceCategory",
    "osFamily", "osVersion", "osVendor").map(StructField(_, StringType)))

  /** Hot path: parse straight to an InternalRow (cached per thread) —
    * avoids the reflective case-class serializer per row. */
  def parseInternal(ua: UTF8String): InternalRow = {
    val i = parse(if (ua == null) null else ua.toString)
    def s(v: String): AnyRef = if (v == null) null else UTF8String.fromString(v)
    new GenericInternalRow(Array[Any](
      s(i.name), s(i.family), s(i.vendor), s(i.uaType), s(i.version),
      s(i.deviceCategory), s(i.osFamily), s(i.osVersion), s(i.osVendor)))
  }

  // Patterns compile ONCE per JVM — `.r` inside the per-row parse path
  // would recompile every pattern per event (measured: dominated the
  // default-mapping stage).
  private val Bot = """(?i).*(bot|crawler|spider|slurp|archiver|fetch|scan).*""".r
  // named-bot extraction: the token carrying the bot marker, plus its
  // optional /version — uadetector reports e.g. Googlebot/2.1 by name
  private val ReBotName = """([A-Za-z][\w.-]*?(?i:bot|crawler|spider|slurp)[\w.-]*)(?:/v?([\d.]+))?""".r
  private val ReEdge = """Edg(?:e|A|iOS)?/([\d.]+)""".r
  private val ReOpera = """OPR/([\d.]+)""".r
  // Presto-era Opera: "Opera/9.80 (...) Presto/... Version/12.16"
  private val ReOperaLegacy = """^Opera/[\d.]+.*?(?:Version/([\d.]+))?$""".r
  private val ReSamsung = """SamsungBrowser/([\d.]+)""".r
  private val ReYandex = """YaBrowser/([\d.]+)""".r
  private val ReUc = """UCBrowser/([\d.]+)""".r
  private val ReVivaldi = """Vivaldi/([\d.]+)""".r
  private val ReWhale = """Whale/([\d.]+)""".r
  private val ReQq = """QQBrowser/([\d.]+)""".r
  // Gecko siblings ship the Firefox token too — they must resolve first
  private val ReSeaMonkey = """SeaMonkey/([\d.]+)""".r
  private val ReWaterfox = """Waterfox/([\d.]+)""".r
  private val RePaleMoon = """PaleMoon/([\d.]+)""".r
  private val ReFirefox = """(?:Firefox|FxiOS)/([\d.]+)""".r
  private val ReCriOs = """CriOS/([\d.]+)""".r
  private val ReChromium = """Chromium/([\d.]+)""".r
  private val ReChrome = """(?:Chrome|HeadlessChrome)/([\d.]+)""".r
  private val ReSilk = """Silk/([\d.]+)""".r
  private val ReSafari = """Version/([\d.]+).*Safari""".r
  private val ReMsie = """MSIE ([\d.]+)""".r
  private val ReTrident = """rv:([\d.]+)\) like Gecko""".r
  private val ReWinPhone = """Windows Phone (?:OS )?([\d.]+)""".r
  private val ReWindows = """Windows NT ([\d.]+)""".r
  private val ReCros = """CrOS [\w-]+ ([\d.]+)""".r
  private val ReKaiOs = """KAIOS/([\d.]+)""".r
  private val ReTizen = """Tizen ([\d.]+)""".r
  private val ReAndroid = """Android ([\d.]+)""".r
  private val ReIos = """(?:iPhone|CPU) OS ([\d_]+)""".r
  private val ReMac = """Mac OS X ([\d_.]+)""".r
  private val SmartTv = Seq("SmartTV", "SMART-TV", "Tizen", "Web0S", "webOS",
    "AppleTV", "GoogleTV", "BRAVIA", "HbbTV", "CrKey", "Roku")
  private val Console = Seq("PlayStation", "Xbox", "Nintendo")
  private val Wearable = Seq("Apple Watch", "Watch OS", "Glass", "SM-R8")
  private val Tablet = Seq("iPad", "Tablet", "Kindle", "Silk/", "KFAPWI", "SM-T")

  private def firstGroup(re: scala.util.matching.Regex, s: String): Option[String] =
    re.findFirstMatchIn(s).map(_.group(1))

  /** Per-thread LRU over parse results — the reference's 1000-entry cache
    * (`UserAgentParserAndCache.java:76-87`, `reference.conf:94-102`): UA
    * strings repeat heavily, so most rows become a map hit. ThreadLocal
    * mirrors the reference's per-mapper-thread cache (no contention). */
  private val CacheSize = 1000
  private val cache = ThreadLocal.withInitial[java.util.LinkedHashMap[String, UaInfo]](() =>
    new java.util.LinkedHashMap[String, UaInfo](CacheSize * 2, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, UaInfo]): Boolean =
        size() > CacheSize
    })

  def parse(ua: String): UaInfo = {
    if (ua == null) return UaInfo(null, null, null, null, null, null, null, null, null)
    val c = cache.get()
    val hit = c.get(ua)
    if (hit != null) return hit
    val computed = parseUncached(ua)
    c.put(ua, computed)
    computed
  }

  private def parseUncached(ua: String): UaInfo = {

    val isBot = Bot.pattern.matcher(ua).matches()

    // Order matters: Edge/Opera/Samsung/Chromium/Chrome embed each other's
    // tokens. Robots report their own marker token + version, as
    // uadetector does (Googlebot/2.1 → name "Googlebot").
    val (name, vendor, version) =
      if (isBot)
        ReBotName.findFirstMatchIn(ua)
          .map(m => (m.group(1), null: String, m.group(2)))
          .getOrElse((null, null, null))
      else firstGroup(ReEdge, ua).map(v => ("Edge", "Microsoft Corporation", v))
        .orElse(firstGroup(ReOpera, ua).map(v => ("Opera", "Opera Software ASA", v)))
        .orElse(if (ua.startsWith("Opera/"))
          Some(("Opera", "Opera Software ASA", firstGroup(ReOperaLegacy, ua).orNull))
        else None)
        .orElse(firstGroup(ReSamsung, ua).map(v => ("Samsung Internet", "Samsung Electronics", v)))
        .orElse(firstGroup(ReYandex, ua).map(v => ("Yandex Browser", "Yandex", v)))
        .orElse(firstGroup(ReUc, ua).map(v => ("UC Browser", "UCWeb Inc.", v)))
        .orElse(firstGroup(ReVivaldi, ua).map(v => ("Vivaldi", "Vivaldi Technologies", v)))
        .orElse(firstGroup(ReWhale, ua).map(v => ("Whale", "NAVER Corp.", v)))
        .orElse(firstGroup(ReQq, ua).map(v => ("QQ Browser", "Tencent", v)))
        .orElse(firstGroup(ReSeaMonkey, ua).map(v => ("SeaMonkey", "Mozilla Foundation", v)))
        .orElse(firstGroup(ReWaterfox, ua).map(v => ("Waterfox", "Waterfox Ltd.", v)))
        .orElse(firstGroup(RePaleMoon, ua).map(v => ("Pale Moon", "Moonchild Productions", v)))
        .orElse(firstGroup(ReFirefox, ua).map(v => ("Firefox", "Mozilla Foundation", v)))
        .orElse(firstGroup(ReCriOs, ua).map(v => ("Chrome", "Google Inc.", v)))
        .orElse(firstGroup(ReChromium, ua).map(v => ("Chromium", "Google Inc.", v)))
        .orElse(firstGroup(ReSilk, ua).map(v => ("Silk", "Amazon.com, Inc.", v)))
        .orElse(firstGroup(ReChrome, ua).map(v => ("Chrome", "Google Inc.", v)))
        .orElse(firstGroup(ReSafari, ua).map(v => ("Safari", "Apple Inc.", v)))
        .orElse(firstGroup(ReMsie, ua).map(v => ("Internet Explorer", "Microsoft Corporation", v)))
        .orElse(firstGroup(ReTrident, ua).map(v => ("Internet Explorer", "Microsoft Corporation", v)))
        .getOrElse((null, null, null))

    val (osFamily, osVersion, osVendor) =
      firstGroup(ReWinPhone, ua).map(v => ("Windows Phone", v, "Microsoft Corporation"))
        .orElse(firstGroup(ReWindows, ua).map(v => ("Windows", v, "Microsoft Corporation")))
        .orElse(firstGroup(ReCros, ua).map(v => ("Chrome OS", v, "Google Inc.")))
        .orElse(firstGroup(ReKaiOs, ua).map(v => ("KaiOS", v, "KaiOS Technologies")))
        .orElse(firstGroup(ReTizen, ua).map(v => ("Tizen", v, "Linux Foundation")))
        .orElse(firstGroup(ReAndroid, ua).map(v => ("Android", v, "Google Inc.")))
        .orElse(firstGroup(ReIos, ua).map(v => ("iOS", v.replace('_', '.'), "Apple Inc.")))
        .orElse(firstGroup(ReMac, ua).map(v => ("OS X", v.replace('_', '.'), "Apple Inc.")))
        .orElse(if (ua.contains("FreeBSD")) Some(("FreeBSD", null, null)) else None)
        .orElse(if (ua.contains("Linux") || ua.contains("X11")) Some(("Linux", null, null)) else None)
        .getOrElse((null, null, null))

    val deviceCategory =
      if (isBot) "Other"
      else if (SmartTv.exists(ua.contains)) "Smart TV"
      else if (Console.exists(ua.contains)) "Game console"
      else if (Wearable.exists(ua.contains)) "Wearable computer"
      else if (Tablet.exists(ua.contains) ||
        (ua.contains("Android") && !ua.contains("Mobile"))) "Tablet"
      else if (ua.contains("Mobile") || ua.contains("iPhone") ||
        ua.contains("Windows Phone")) "Smartphone"
      else "Personal computer"

    val uaType = if (isBot) "Robot" else "Browser"
    UaInfo(name, name, vendor, uaType, version, deviceCategory,
      osFamily, osVersion, osVendor)
  }
}
