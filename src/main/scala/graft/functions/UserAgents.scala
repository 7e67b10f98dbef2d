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
  def parseInternal(ua: UTF8String): InternalRow = parseInternal(ua, null)

  /** As above, with an optional loaded rule database ([[UaDatabase]],
    * uap-core `regexes.yaml`) consulted first; null path = built-ins only. */
  def parseInternal(ua: UTF8String, dbPath: String): InternalRow = {
    val i = parseWith(if (ua == null) null else ua.toString, dbPath)
    def s(v: String): AnyRef = if (v == null) null else UTF8String.fromString(v)
    new GenericInternalRow(Array[Any](
      s(i.name), s(i.family), s(i.vendor), s(i.uaType), s(i.version),
      s(i.deviceCategory), s(i.osFamily), s(i.osVersion), s(i.osVendor)))
  }

  // Patterns compile ONCE per JVM — `.r` inside the per-row parse path
  // would recompile every pattern per event (measured: dominated the
  // default-mapping stage).
  private val Bot = """(?i).*(bot|crawler|spider|slurp|archiver|fetch|scan).*""".r

  /** Non-browser clients, checked BEFORE the bot heuristic and the browser
    * chain (e.g. node-fetch carries "fetch" but is a library, not a robot;
    * in-app webviews carry Chrome/Safari tokens but should report the app).
    * Each row: token regex with a version group, reported name, vendor,
    * uadetector-style type. Order matters only within a family cluster. */
  private val ClientPatterns: Seq[(scala.util.matching.Regex, String, String, String)] = Seq(
    // ---- libraries / http clients (uadetector type "Library")
    ("""^curl/([\d.]+)""".r, "cURL", null, "Library"),
    ("""^Wget/([\d.]+)""".r, "Wget", "GNU Project", "Offline Browser"),
    ("""python-requests/([\d.]+)""".r, "Python Requests", null, "Library"),
    ("""^Python-urllib/([\d.]+)""".r, "Python urllib", null, "Library"),
    ("""^Go-http-client/([\d.]+)""".r, "Go http client", "Google Inc.", "Library"),
    ("""^okhttp/([\d.]+)""".r, "OkHttp", "Square, Inc.", "Library"),
    ("""^Apache-HttpClient/([\d.]+)""".r, "Apache HttpClient", "Apache Software Foundation", "Library"),
    ("""^Java/([\d._]+)""".r, "Java HttpURLConnection", "Oracle Corporation", "Library"),
    ("""^libwww-perl/([\d.]+)""".r, "libwww-perl", null, "Library"),
    ("""node-fetch/?([\d.]+)?""".r, "node-fetch", null, "Library"),
    ("""^axios/([\d.]+)""".r, "axios", null, "Library"),
    ("""^Dart/([\d.]+)""".r, "Dart http", "Google Inc.", "Library"),
    ("""GuzzleHttp/([\d.]+)""".r, "Guzzle", null, "Library"),
    ("""aiohttp/([\d.]+)""".r, "aiohttp", null, "Library"),
    ("""^PostmanRuntime/([\d.]+)""".r, "Postman", "Postman, Inc.", "Library"),
    ("""^insomnia/([\d.]+)""".r, "Insomnia", "Kong Inc.", "Library"),
    ("""Dalvik/([\d.]+)""".r, "Dalvik", "Google Inc.", "Library"),
    ("""^HTTrack(?:\s+Website\s+Copier)?/?v?([\d.]+)?""".r, "HTTrack", null, "Offline Browser"),
    // ---- email clients
    ("""Thunderbird/([\d.]+)""".r, "Thunderbird", "Mozilla Foundation", "Email client"),
    ("""Microsoft Outlook ([\d.]+)""".r, "Microsoft Outlook", "Microsoft Corporation", "Email client"),
    ("""Lotus-Notes/([\d.]+)""".r, "Lotus Notes", "IBM", "Email client"),
    // ---- feed readers
    ("""Feedly/?([\d.]+)?""".r, "Feedly", "Feedly Inc.", "Feed Reader"),
    ("""NetNewsWire/([\d.]+)""".r, "NetNewsWire", null, "Feed Reader"),
    ("""FreshRSS/([\d.]+)""".r, "FreshRSS", null, "Feed Reader"),
    ("""Tiny Tiny RSS/([\d.]+)""".r, "Tiny Tiny RSS", null, "Feed Reader"),
    // ---- media players
    ("""^VLC/([\d.]+)""".r, "VLC media player", "VideoLAN", "Multimedia Player"),
    ("""^iTunes/([\d.]+)""".r, "iTunes", "Apple Inc.", "Multimedia Player"),
    ("""^Winamp/([\d.]+)""".r, "Winamp", null, "Multimedia Player"),
    ("""Spotify/([\d.]+)""".r, "Spotify", "Spotify AB", "Multimedia Player"),
    ("""^Sonos/([\d.]+)""".r, "Sonos", "Sonos, Inc.", "Multimedia Player"),
    // ---- validators
    ("""W3C_Validator/([\d.]+)""".r, "W3C Validator", "W3C", "Validator"),
    ("""Jigsaw/([\d.]+)""".r, "Jigsaw", "W3C", "Validator"),
    // ---- in-app webviews (before browsers: they carry Safari/Chrome tokens)
    ("""FB[AI][VN]/([\d.]+)""".r, "Facebook App", "Meta Platforms, Inc.", "Mobile App"),
    ("""Instagram ([\d.]+)""".r, "Instagram App", "Meta Platforms, Inc.", "Mobile App"),
    ("""MicroMessenger/([\d.]+)""".r, "WeChat", "Tencent", "Mobile App"),
    ("""musical_ly_([\d.]+)""".r, "TikTok App", "ByteDance", "Mobile App"),
    ("""BytedanceWebview/([\d.]+)""".r, "TikTok App", "ByteDance", "Mobile App"),
    ("""Snapchat/([\d.]+)""".r, "Snapchat App", "Snap Inc.", "Mobile App"),
    ("""Twitter for iPhone()""".r, "Twitter App", "X Corp.", "Mobile App"),
    ("""\bLine/([\d.]+)""".r, "LINE App", "LY Corporation", "Mobile App"),
    ("""\bGSA/([\d.]+)""".r, "Google Search App", "Google Inc.", "Mobile App"),
    ("""DuckDuckGo/([\d.]+)""".r, "DuckDuckGo Browser", "DuckDuckGo, Inc.", "Mobile Browser"),
    // ---- text / niche / legacy browsers (unique tokens)
    ("""^Lynx/([\d.]+)""".r, "Lynx", null, "Browser"),
    ("""^w3m/([\d.]+)""".r, "w3m", null, "Browser"),
    ("""^ELinks/([\d.]+)""".r, "ELinks", null, "Browser"),
    ("""^Links \(([\d.]+)""".r, "Links", null, "Browser"),
    ("""NetSurf/([\d.]+)""".r, "NetSurf", null, "Browser"),
    ("""Dillo/([\d.]+)""".r, "Dillo", null, "Browser"),
    ("""Konqueror/([\d.]+)""".r, "Konqueror", "KDE", "Browser"),
    ("""Epiphany/([\d.]+)""".r, "GNOME Web", "GNOME Foundation", "Browser"),
    ("""Midori/([\d.]+)""".r, "Midori", null, "Browser"),
    ("""Falkon/([\d.]+)""".r, "Falkon", "KDE", "Browser"),
    ("""QupZilla/([\d.]+)""".r, "QupZilla", null, "Browser"),
    ("""Otter/([\d.]+)""".r, "Otter Browser", null, "Browser"),
    ("""iCab/([\d.]+)""".r, "iCab", null, "Browser"),
    ("""OmniWeb/v?([\d.]+)""".r, "OmniWeb", "The Omni Group", "Browser"),
    ("""Camino/([\d.]+)""".r, "Camino", null, "Browser"),
    ("""K-Meleon/([\d.]+)""".r, "K-Meleon", null, "Browser"),
    ("""Galeon/([\d.]+)""".r, "Galeon", null, "Browser"),
    ("""Maxthon[/ ]([\d.]+)""".r, "Maxthon", "Maxthon Ltd.", "Browser"),
    ("""Sleipnir/([\d.]+)""".r, "Sleipnir", "Fenrir Inc.", "Browser"),
    ("""Iron/([\d.]+)""".r, "SRWare Iron", "SRWare", "Browser"),
    ("""coc_coc_browser/([\d.]+)""".r, "Coc Coc", "Coc Coc Co.", "Browser"),
    ("""Puffin/([\d.]+)""".r, "Puffin", "CloudMosa, Inc.", "Mobile Browser"),
    ("""Dolfin/([\d.]+)""".r, "Dolphin", null, "Mobile Browser"),
    ("""Dolphin/([\d.]+)""".r, "Dolphin", null, "Mobile Browser"),
    ("""(?:BIDUBrowser|baidubrowser)[/ ]([\d.]+)""".r, "Baidu Browser", "Baidu, Inc.", "Browser"),
    ("""SE ([\d.]+\w*) MetaSr""".r, "Sogou Explorer", "Sogou Inc.", "Browser"),
    ("""2345Explorer/([\d.]+)""".r, "2345 Explorer", null, "Browser"),
    ("""LieBaoFast/([\d.]+)""".r, "Cheetah Browser", "Cheetah Mobile", "Browser"),
    ("""Quark/([\d.]+)""".r, "Quark", "Alibaba Group", "Mobile Browser"),
    ("""MiuiBrowser/([\d.]+)""".r, "Mi Browser", "Xiaomi Corporation", "Mobile Browser"),
    ("""HuaweiBrowser/([\d.]+)""".r, "Huawei Browser", "Huawei Technologies", "Mobile Browser"),
    ("""VivoBrowser/([\d.]+)""".r, "Vivo Browser", "Vivo", "Mobile Browser"),
    ("""HeyTapBrowser/([\d.]+)""".r, "HeyTap Browser", "OPPO", "Mobile Browser"),
    ("""OppoBrowser/([\d.]+)""".r, "Oppo Browser", "OPPO", "Mobile Browser"),
    ("""Mb2345Browser/([\d.]+)""".r, "2345 Browser", null, "Mobile Browser"),
    ("""IceWeasel/([\d.]+)""".r, "IceWeasel", "Debian Project", "Browser"),
    ("""Iceweasel/([\d.]+)""".r, "IceWeasel", "Debian Project", "Browser"),
    ("""IceCat/([\d.]+)""".r, "GNU IceCat", "GNU Project", "Browser"),
    ("""Fennec/([\d.]+)""".r, "Firefox Mobile", "Mozilla Foundation", "Mobile Browser"),
    ("""Focus/([\d.]+)""".r, "Firefox Focus", "Mozilla Foundation", "Mobile Browser"),
    ("""Klar/([\d.]+)""".r, "Firefox Klar", "Mozilla Foundation", "Mobile Browser"),
    ("""Arora/([\d.]+)""".r, "Arora", null, "Browser"),
    ("""Lunascape[/ ]([\d.]+)""".r, "Lunascape", "Lunascape Corporation", "Browser"),
    ("""Avant Browser()""".r, "Avant Browser", null, "Browser"),
    ("""Netscape6?/([\d.]+)""".r, "Netscape Navigator", "Netscape Communications", "Browser"),
    ("""Navigator/([\d.]+)""".r, "Netscape Navigator", "Netscape Communications", "Browser"),
    ("""NCSA_Mosaic/([\d.]+)""".r, "NCSA Mosaic", "NCSA", "Browser"))
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
  private val ReRimTablet = """RIM Tablet OS ([\d.]+)""".r
  private val ReSymbian = """SymbianOS/([\d.]+)""".r
  private val ReWebOs = """(?:webOS|hpwOS)/([\d.]+)""".r
  private val ReBada = """Bada/([\d.]+)""".r
  private val ReUbuntu = """Ubuntu/([\d.]+)""".r
  private val ReFedora = """Fedora/([\d.]+)""".r
  // "Web0S" (zero) is the LG TV token; lowercase-o "webOS" is the Palm/HP
  // PHONE OS and must not land in Smart TV
  private val SmartTv = Seq("SmartTV", "SMART-TV", "Tizen", "Web0S",
    "AppleTV", "GoogleTV", "BRAVIA", "HbbTV", "CrKey", "Roku")
  private val Console = Seq("PlayStation", "Xbox", "Nintendo")
  private val Wearable = Seq("Apple Watch", "Watch OS", "Glass", "SM-R8")
  private val Pda = Seq("Windows CE", "PalmOS", "PalmSource", "PocketPC")
  private val Tablet = Seq("iPad", "Tablet", "Kindle", "Silk/", "KFAPWI",
    "SM-T", "Kobo", "NOOK", "PlayBook", "TouchPad")
  /** Client types that are not tied to an end-user device at all. */
  private val NonDeviceTypes = Set("Library", "Validator", "Offline Browser",
    "Feed Reader")

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

  def parse(ua: String): UaInfo = parseWith(ua, null)

  /** Built-in classification, refined by the loaded rule database at
    * `dbPath` when given ([[UaDatabase]], uap-core `regexes.yaml`): a
    * database match overrides name/family/version (and OS fields on an OS
    * match); a database miss falls back to the built-ins untouched, so
    * loading a database can only add coverage, never lose it. The LRU key
    * folds in the database's content stamp — a hot reload invalidates
    * cached classifications without an explicit flush (the reference
    * rebuilds its parser+cache pair on update,
    * `UserAgentParserAndCache.java:58-66`). */
  def parseWith(ua: String, dbPath: String): UaInfo = {
    if (ua == null) return UaInfo(null, null, null, null, null, null, null, null, null)
    val db = if (dbPath == null) null else UaDatabase.current(dbPath)
    // distinct leading tags keep the builtin and db-stamped key spaces
    // disjoint (a raw UA resembling "stamp\u0000ua" must not collide)
    val key = if (db == null) "B" + ua else "D" + db.stamp + "\u0000" + ua
    val c = cache.get()
    val hit = c.get(key)
    if (hit != null) return hit
    val base = parseUncached(ua)
    val computed = if (db == null) base else mergeDb(base, ua, db)
    c.put(key, computed)
    computed
  }

  /** Database-over-builtin merge. Vendor is a uadetector-surface field
    * uap-core doesn't carry, so it survives only when the database agrees
    * with the built-in family (else absent — never a wrong vendor for a
    * renamed family). uap-core flags robots through the device section's
    * "Spider" family. */
  private def mergeDb(base: UaInfo, ua: String, db: UaDatabase.Db): UaInfo = {
    val h = UaDatabase.classify(db, ua)
    val spider = h.deviceFamily == "Spider" || h.deviceBrand == "Spider"
    val uaHit = h.family != null && h.family != "Other"
    val osHit = h.osFamily != null && h.osFamily != "Other"
    UaInfo(
      name = if (uaHit) h.family else base.name,
      family = if (uaHit) h.family else base.family,
      vendor = if (!uaHit || h.family == base.name) base.vendor else null,
      uaType = if (spider) "Robot" else base.uaType,
      version = if (uaHit) h.version else base.version,
      deviceCategory = if (spider) "Other" else base.deviceCategory,
      osFamily = if (osHit) h.osFamily else base.osFamily,
      osVersion = if (osHit) h.osVersion else base.osVersion,
      osVendor = if (!osHit || h.osFamily == base.osFamily) base.osVendor else null)
  }

  private def parseUncached(ua: String): UaInfo = {

    // Non-browser clients resolve FIRST: libraries/apps/email/feed/media
    // tokens are unambiguous, and some ("node-fetch") would false-positive
    // the bot heuristic while others (in-app webviews) carry Chrome/Safari
    // tokens that the browser chain would claim.
    val clientHit = ClientPatterns.iterator
      .map { case (re, n, v, t) => (re.findFirstMatchIn(ua), n, v, t) }
      .collectFirst { case (Some(m), n, v, t) =>
        (n, v, Option(m.group(1)).filter(_.nonEmpty).orNull, t)
      }

    val isBot = clientHit.isEmpty && Bot.pattern.matcher(ua).matches()

    // Order matters: Edge/Opera/Samsung/Chromium/Chrome embed each other's
    // tokens. Robots report their own marker token + version, as
    // uadetector does (Googlebot/2.1 → name "Googlebot").
    val (name, vendor, version) =
      if (clientHit.isDefined) {
        val (n, v, ver, _) = clientHit.get; (n, v, ver)
      }
      else if (isBot)
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
        // pre-NT and CE windows (legacy corpus tails)
        .orElse(if (ua.contains("Windows CE")) Some(("Windows CE", null, "Microsoft Corporation")) else None)
        .orElse(if (ua.contains("Win 9x 4.90")) Some(("Windows", "ME", "Microsoft Corporation")) else None)
        .orElse(if (ua.contains("Windows 98") || ua.contains("Win98")) Some(("Windows", "98", "Microsoft Corporation")) else None)
        .orElse(if (ua.contains("Windows 95") || ua.contains("Win95")) Some(("Windows", "95", "Microsoft Corporation")) else None)
        .orElse(firstGroup(ReCros, ua).map(v => ("Chrome OS", v, "Google Inc.")))
        .orElse(firstGroup(ReKaiOs, ua).map(v => ("KaiOS", v, "KaiOS Technologies")))
        .orElse(firstGroup(ReTizen, ua).map(v => ("Tizen", v, "Linux Foundation")))
        // HarmonyOS UAs still carry an Android token — resolve first
        .orElse(if (ua.contains("HarmonyOS")) Some(("HarmonyOS", null, "Huawei Technologies")) else None)
        .orElse(firstGroup(ReAndroid, ua).map(v => ("Android", v, "Google Inc.")))
        .orElse(firstGroup(ReIos, ua).map(v => ("iOS", v.replace('_', '.'), "Apple Inc.")))
        .orElse(firstGroup(ReMac, ua).map(v => ("OS X", v.replace('_', '.'), "Apple Inc.")))
        // mobile OS long tail
        .orElse(if (ua.contains("BB10")) Some(("BlackBerry OS", "10", "BlackBerry Ltd.")) else None)
        .orElse(if (ua.contains("BlackBerry")) Some(("BlackBerry OS", null, "BlackBerry Ltd.")) else None)
        .orElse(firstGroup(ReRimTablet, ua).map(v => ("RIM Tablet OS", v, "BlackBerry Ltd.")))
        .orElse(firstGroup(ReSymbian, ua).map(v => ("Symbian OS", v, "Symbian Foundation")))
        .orElse(if (ua.contains("Series60") || ua.contains("S60")) Some(("Symbian OS", null, "Symbian Foundation")) else None)
        .orElse(firstGroup(ReWebOs, ua).map(v => ("webOS", v, "LG Electronics")))
        .orElse(if (ua.contains("web0S") || ua.contains("webOS")) Some(("webOS", null, "LG Electronics")) else None)
        .orElse(firstGroup(ReBada, ua).map(v => ("Bada", v, "Samsung Electronics")))
        .orElse(if (ua.contains("Sailfish")) Some(("Sailfish OS", null, "Jolla Ltd.")) else None)
        .orElse(if (ua.contains("MeeGo")) Some(("MeeGo", null, "Linux Foundation")) else None)
        .orElse(if (ua.contains("Maemo")) Some(("Maemo", null, "Nokia")) else None)
        // desktop unix family: named distros before the generic bucket
        // (uadetector reports distro-level OS families)
        .orElse(firstGroup(ReUbuntu, ua).map(v => ("Ubuntu", v, "Canonical Ltd."))
          .orElse(if (ua.contains("Ubuntu")) Some(("Ubuntu", null, "Canonical Ltd.")) else None))
        .orElse(firstGroup(ReFedora, ua).map(v => ("Fedora", v, "Red Hat, Inc."))
          .orElse(if (ua.contains("Fedora")) Some(("Fedora", null, "Red Hat, Inc.")) else None))
        .orElse(if (ua.contains("Debian")) Some(("Debian", null, "Debian Project")) else None)
        .orElse(if (ua.contains("CentOS")) Some(("CentOS", null, null)) else None)
        .orElse(if (ua.contains("openSUSE") || ua.contains("SUSE")) Some(("openSUSE", null, "SUSE")) else None)
        .orElse(if (ua.contains("Gentoo")) Some(("Gentoo", null, "Gentoo Foundation")) else None)
        .orElse(if (ua.contains("Linux Mint")) Some(("Linux Mint", null, null)) else None)
        .orElse(if (ua.contains("SunOS")) Some(("Solaris", null, "Oracle Corporation")) else None)
        .orElse(if (ua.contains("FreeBSD")) Some(("FreeBSD", null, null)) else None)
        .orElse(if (ua.contains("OpenBSD")) Some(("OpenBSD", null, null)) else None)
        .orElse(if (ua.contains("NetBSD")) Some(("NetBSD", null, null)) else None)
        .orElse(if (ua.contains("DragonFly")) Some(("DragonFly BSD", null, null)) else None)
        .orElse(if (ua.contains("Haiku")) Some(("Haiku", null, "Haiku, Inc.")) else None)
        .orElse(if (ua.contains("BeOS")) Some(("BeOS", null, null)) else None)
        .orElse(if (ua.contains("AmigaOS")) Some(("AmigaOS", null, null)) else None)
        .orElse(if (ua.contains("MorphOS")) Some(("MorphOS", null, null)) else None)
        .orElse(if (ua.contains("OS/2") || ua.contains("Warp")) Some(("OS/2", null, "IBM")) else None)
        .orElse(if (ua.contains("Fuchsia")) Some(("Fuchsia", null, "Google Inc.")) else None)
        .orElse(if (ua.contains("Linux") || ua.contains("X11")) Some(("Linux", null, null)) else None)
        .getOrElse((null, null, null))

    val deviceCategory =
      if (isBot) "Other"
      else if (clientHit.exists(h => NonDeviceTypes(h._4))) "Other"
      else if (SmartTv.exists(ua.contains)) "Smart TV"
      else if (Console.exists(ua.contains)) "Game console"
      else if (Wearable.exists(ua.contains)) "Wearable computer"
      else if (Pda.exists(ua.contains)) "PDA"
      // a mobile app's webview is a phone unless a tablet token says so —
      // app UAs frequently omit the "Mobile" hint the browser chain keys on
      else if (clientHit.exists(_._4 == "Mobile App") &&
        !Tablet.exists(ua.contains)) "Smartphone"
      else if (Tablet.exists(ua.contains) ||
        (ua.contains("Android") && !ua.contains("Mobile"))) "Tablet"
      else if (ua.contains("Mobile") || ua.contains("iPhone") ||
        ua.contains("Windows Phone") || ua.contains("BB10") ||
        osFamily == "Symbian OS" || osFamily == "Bada" ||
        osFamily == "webOS") "Smartphone"
      else "Personal computer"

    val uaType =
      clientHit.map(_._4).getOrElse(if (isBot) "Robot" else "Browser")
    UaInfo(name, name, vendor, uaType, version, deviceCategory,
      osFamily, osVersion, osVendor)
  }
}
