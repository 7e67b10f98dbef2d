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
}
