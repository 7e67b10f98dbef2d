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

  private val Bot = """(?i).*(bot|crawler|spider|slurp|archiver|fetch|scan).*""".r

  private def firstGroup(re: scala.util.matching.Regex, s: String): Option[String] =
    re.findFirstMatchIn(s).map(_.group(1))

  def parse(ua: String): UaInfo = {
    if (ua == null) return UaInfo(null, null, null, null, null, null, null, null, null)

    val isBot = Bot.pattern.matcher(ua).matches()

    // Order matters: Edge/Opera/Chrome embed each other's tokens.
    val (name, vendor, version) =
      firstGroup("""Edg(?:e|A|iOS)?/([\d.]+)""".r, ua).map(v => ("Edge", "Microsoft Corporation", v))
        .orElse(firstGroup("""OPR/([\d.]+)""".r, ua).map(v => ("Opera", "Opera Software ASA", v)))
        .orElse(firstGroup("""Firefox/([\d.]+)""".r, ua).map(v => ("Firefox", "Mozilla Foundation", v)))
        .orElse(firstGroup("""Chrome/([\d.]+)""".r, ua).map(v => ("Chrome", "Google Inc.", v)))
        .orElse(firstGroup("""Version/([\d.]+).*Safari""".r, ua).map(v => ("Safari", "Apple Inc.", v)))
        .orElse(firstGroup("""MSIE ([\d.]+)""".r, ua).map(v => ("Internet Explorer", "Microsoft Corporation", v)))
        .orElse(firstGroup("""rv:([\d.]+)\) like Gecko""".r, ua).map(v => ("Internet Explorer", "Microsoft Corporation", v)))
        .getOrElse((null, null, null))

    val (osFamily, osVersion, osVendor) =
      firstGroup("""Windows NT ([\d.]+)""".r, ua).map(v => ("Windows", v, "Microsoft Corporation"))
        .orElse(firstGroup("""Android ([\d.]+)""".r, ua).map(v => ("Android", v, "Google Inc.")))
        .orElse(firstGroup("""(?:iPhone|CPU) OS ([\d_]+)""".r, ua).map(v => ("iOS", v.replace('_', '.'), "Apple Inc.")))
        .orElse(firstGroup("""Mac OS X ([\d_.]+)""".r, ua).map(v => ("OS X", v.replace('_', '.'), "Apple Inc.")))
        .orElse(if (ua.contains("Linux")) Some(("Linux", null, null)) else None)
        .getOrElse((null, null, null))

    val deviceCategory =
      if (isBot) "Other"
      else if (ua.contains("iPad") || (ua.contains("Android") && !ua.contains("Mobile"))) "Tablet"
      else if (ua.contains("Mobile") || ua.contains("iPhone")) "Smartphone"
      else "Personal computer"

    val uaType = if (isBot) "Robot" else "Browser"
    UaInfo(name, name, vendor, uaType, version, deviceCategory,
      osFamily, osVersion, osVendor)
  }
}
