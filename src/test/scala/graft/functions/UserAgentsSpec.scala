package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** UA classification surface (the uadetector stand-in,
  * `UserAgentParserAndCache.java:40-88`): browser families incl. embedded
  * tokens, named robots, and the device-category taxonomy. */
class UserAgentsSpec extends AnyFunSuite {

  private def p(ua: String) = UserAgents.parse(ua)

  test("embedded-token browsers resolve in precedence order") {
    val edge = p("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91")
    assert(edge.name === "Edge" && edge.version === "120.0.2210.91")
    val opera = p("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0")
    assert(opera.name === "Opera")
    val samsung = p("Mozilla/5.0 (Linux; Android 13; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36")
    assert(samsung.name === "Samsung Internet" && samsung.version === "23.0")
    assert(samsung.osFamily === "Android" && samsung.deviceCategory === "Smartphone")
  }

  test("named robots carry their marker token and version") {
    val g = p("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)")
    assert(g.uaType === "Robot" && g.name === "Googlebot" && g.version === "2.1")
    assert(g.deviceCategory === "Other")
    val bing = p("Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)")
    assert(bing.uaType === "Robot" && bing.name === "bingbot")
  }

  test("device taxonomy: smart TV, game console, tablet, smartphone, PC") {
    assert(p("Mozilla/5.0 (SMART-TV; Linux; Tizen 6.5) AppleWebKit/537.36 (KHTML, like Gecko) Version/6.5 TV Safari/537.36")
      .deviceCategory === "Smart TV")
    assert(p("Mozilla/5.0 (PlayStation 5/SmartTV) AppleWebKit/605.1.15 (KHTML, like Gecko)")
      .deviceCategory === "Smart TV") // TV token wins when both appear
    assert(p("Mozilla/5.0 (PlayStation; PlayStation 5/2.26) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/13.0 Safari/605.1.15")
      .deviceCategory === "Game console")
    assert(p("Mozilla/5.0 (iPad; CPU OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1")
      .deviceCategory === "Tablet")
    assert(p("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36")
      .deviceCategory === "Personal computer")
  }

  test("chrome OS resolves before the generic Linux fallback") {
    val cros = p("Mozilla/5.0 (X11; CrOS x86_64 14541.0.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36")
    assert(cros.osFamily === "Chrome OS" && cros.osVendor === "Google Inc.")
  }

  test("null and unknown strings classify without throwing") {
    assert(p(null).name === null)
    val unknown = p("totally-unknown-agent/1.0")
    assert(unknown.uaType === "Browser" && unknown.name === null)
  }

  // ------------------------------------------------------------------
  // Real-world corpus (the reference pins its uadetector output against
  // curated browser lists, `src/test/java/io/divolte/server/BrowserLists
  // .java` — same idea here with public UA strings): each row asserts
  // name, version, device category, and OS family.
  private case class Expect(ua: String, name: String, version: String,
                            device: String, os: String, uaType: String = "Browser")

  private val corpus = Seq(
    Expect("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome", "120.0.0.0", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/119.0",
      "Firefox", "119.0", "Personal computer", "Linux"),
    Expect("Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1",
      "Safari", "16.6", "Smartphone", "iOS"),
    Expect("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",
      "Safari", "17.1", "Personal computer", "OS X"),
    Expect("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome", "120.0.0.0", "Personal computer", "OS X"),
    Expect("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",
      "Edge", "120.0.2210.91", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (Linux; Android 13; Pixel 7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.144 Mobile Safari/537.36 EdgA/120.0.2210.157",
      "Edge", "120.0.2210.157", "Smartphone", "Android"),
    Expect("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) EdgiOS/120.2210.150 Version/17.0 Mobile/15E148 Safari/604.1",
      "Edge", "120.2210.150", "Smartphone", "iOS"),
    Expect("Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0",
      "Opera", "105.0.0.0", "Personal computer", "Windows"),
    Expect("Opera/9.80 (Windows NT 6.1; WOW64) Presto/2.12.388 Version/12.16",
      "Opera", "12.16", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (Linux; Android 13; SM-S918B) AppleWebKit/537.36 (KHTML, like Gecko) SamsungBrowser/23.0 Chrome/115.0.0.0 Mobile Safari/537.36",
      "Samsung Internet", "23.0", "Smartphone", "Android"),
    Expect("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 YaBrowser/24.1.0.0 Safari/537.36",
      "Yandex Browser", "24.1.0.0", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (Linux; U; Android 13; en-US; RMX3630) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/100.0.4896.58 UCBrowser/13.6.5.1316 Mobile Safari/537.36",
      "UC Browser", "13.6.5.1316", "Smartphone", "Android"),
    Expect("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Vivaldi/6.5.3206.48",
      "Vivaldi", "6.5.3206.48", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Whale/3.24.223.18 Safari/537.36",
      "Whale", "3.24.223.18", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (Windows NT 10.0; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/94.0.4606.71 Safari/537.36 QQBrowser/12.1.5496.400",
      "QQ Browser", "12.1.5496.400", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (X11; Linux x86_64; rv:60.0) Gecko/20100101 Firefox/60.0 SeaMonkey/2.53.18",
      "SeaMonkey", "2.53.18", "Personal computer", "Linux"),
    Expect("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/56.0.2924.87 Safari/537.36 Waterfox/56.2.5",
      "Waterfox", "56.2.5", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:102.0) Gecko/20100101 Goanna/5.2 PaleMoon/32.4.0.1",
      "Pale Moon", "32.4.0.1", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) FxiOS/120.0 Mobile/15E148 Safari/605.1.15",
      "Firefox", "120.0", "Smartphone", "iOS"),
    Expect("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) CriOS/120.0.6099.119 Mobile/15E148 Safari/604.1",
      "Chrome", "120.0.6099.119", "Smartphone", "iOS"),
    // distro-level OS family since r6 (uadetector reports Ubuntu, not Linux)
    Expect("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Ubuntu Chromium/119.0.6045.199 Chrome/119.0.6045.199 Safari/537.36",
      "Chromium", "119.0.6045.199", "Personal computer", "Ubuntu"),
    Expect("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) HeadlessChrome/119.0.6045.105 Safari/537.36",
      "Chrome", "119.0.6045.105", "Personal computer", "Linux"),
    Expect("Mozilla/5.0 (Linux; Android 9; KFTRWI) AppleWebKit/537.36 (KHTML, like Gecko) Silk/120.2.1 like Chrome/120.0.6099.115 Safari/537.36",
      "Silk", "120.2.1", "Tablet", "Android"),
    Expect("Mozilla/5.0 (Linux; Android 13; SM-T970) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.6099.144 Safari/537.36",
      "Chrome", "120.0.6099.144", "Tablet", "Android"),
    Expect("Mozilla/5.0 (compatible; MSIE 9.0; Windows NT 6.1; WOW64; Trident/5.0)",
      "Internet Explorer", "9.0", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (Windows NT 10.0; WOW64; Trident/7.0; rv:11.0) like Gecko",
      "Internet Explorer", "11.0", "Personal computer", "Windows"),
    Expect("Mozilla/5.0 (Windows Phone 10.0; Android 6.0.1; Microsoft; Lumia 950) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/52.0.2743.116 Mobile Safari/537.36 Edge/15.14977",
      "Edge", "15.14977", "Smartphone", "Windows Phone"),
    Expect("Mozilla/5.0 (Mobile; Nokia_8110_4G; rv:48.0) Gecko/48.0 Firefox/48.0 KAIOS/2.5",
      "Firefox", "48.0", "Smartphone", "KaiOS"),
    Expect("Mozilla/5.0 (SMART-TV; LINUX; Tizen 6.0) AppleWebKit/537.36 (KHTML, like Gecko) 76.0.3809.146/6.0 TV Safari/537.36",
      null, null, "Smart TV", "Tizen"),
    Expect("Mozilla/5.0 (X11; Linux armv7l) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/88.0.4324.109 Safari/537.36 CrKey/1.56.500000",
      "Chrome", "88.0.4324.109", "Smart TV", "Linux"),
    Expect("Mozilla/5.0 (Apple Watch; CPU OS 10_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko)",
      null, null, "Wearable computer", "iOS"),
    Expect("Mozilla/5.0 (PlayStation; PlayStation 5/2.26) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/13.0 Safari/605.1.15",
      "Safari", "13.0", "Game console", null),
    Expect("Mozilla/5.0 (Windows NT 10.0; Win64; x64; Xbox; Xbox One) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/70.0.3538.102 Safari/537.36 Edge/18.19041",
      "Edge", "18.19041", "Game console", "Windows"),
    Expect("Mozilla/5.0 (Nintendo Switch; WifiWebAuthApplet) AppleWebKit/606.4 (KHTML, like Gecko) NF/6.0.1.15.4 NintendoBrowser/5.1.0.20393",
      null, null, "Game console", null),
    Expect("Mozilla/5.0 (X11; FreeBSD amd64; rv:109.0) Gecko/20100101 Firefox/115.0",
      "Firefox", "115.0", "Personal computer", "FreeBSD"),
    Expect("Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
      "Googlebot", "2.1", "Other", null, uaType = "Robot"),
    Expect("Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
      "bingbot", "2.0", "Other", null, uaType = "Robot"),
    Expect("Mozilla/5.0 (compatible; Baiduspider/2.0; +http://www.baidu.com/search/spider.html)",
      "Baiduspider", "2.0", "Other", null, uaType = "Robot"),
    Expect("Mozilla/5.0 (compatible; YandexBot/3.0; +http://yandex.com/bots)",
      "YandexBot", "3.0", "Other", null, uaType = "Robot"),
    Expect("Mozilla/5.0 AppleWebKit/537.36 (KHTML, like Gecko; compatible; GPTBot/1.0; +https://openai.com/gptbot)",
      "GPTBot", "1.0", "Other", null, uaType = "Robot"))

  test(s"real-world corpus of ${corpus.size} UA strings classifies as expected") {
    assert(corpus.size >= 30)
    corpus.foreach { e =>
      val r = p(e.ua)
      assert(r.name === e.name, s"name for: ${e.ua}")
      assert(r.version === e.version, s"version for: ${e.ua}")
      assert(r.deviceCategory === e.device, s"device for: ${e.ua}")
      assert(r.osFamily === e.os, s"os for: ${e.ua}")
      assert(r.uaType === e.uaType, s"type for: ${e.ua}")
    }
  }
}
