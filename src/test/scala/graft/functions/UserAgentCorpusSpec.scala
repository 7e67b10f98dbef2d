package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Breadth corpus for the r6 UA expansion: libraries/HTTP clients, email
  * clients, feed readers, media players, validators, in-app webviews,
  * ~40 niche/legacy browser families, distro-level and long-tail OS
  * families, and extra device categories. Each entry pins (name, type,
  * osFamily, deviceCategory); the rate test measures how much of the whole
  * corpus each of the 9 producers classifies (the uadetector-fidelity
  * criterion: a long-tail string should come back classified, not null). */
class UserAgentCorpusSpec extends AnyFunSuite {

  private case class E(ua: String, name: String, typ: String, os: String,
      device: String)

  private val corpus = Seq(
    // ------------------------------------------------ libraries / clients
    E("curl/8.4.0", "cURL", "Library", null, "Other"),
    E("Wget/1.21.4", "Wget", "Offline Browser", null, "Other"),
    E("python-requests/2.31.0", "Python Requests", "Library", null, "Other"),
    E("Python-urllib/3.11", "Python urllib", "Library", null, "Other"),
    E("Go-http-client/2.0", "Go http client", "Library", null, "Other"),
    E("okhttp/4.12.0", "OkHttp", "Library", null, "Other"),
    E("Apache-HttpClient/5.2.1 (Java/17.0.8)", "Apache HttpClient", "Library", null, "Other"),
    E("Java/17.0.2", "Java HttpURLConnection", "Library", null, "Other"),
    E("libwww-perl/6.72", "libwww-perl", "Library", null, "Other"),
    E("node-fetch/1.0 (+https://github.com/bitinn/node-fetch)", "node-fetch", "Library", null, "Other"),
    E("axios/1.6.2", "axios", "Library", null, "Other"),
    E("Dart/3.2 (dart:io)", "Dart http", "Library", null, "Other"),
    E("GuzzleHttp/7.8.1 curl/8.4.0 PHP/8.2.13", "Guzzle", "Library", null, "Other"),
    E("Mozilla/5.0 (compatible; aiohttp/3.9.1)", "aiohttp", "Library", null, "Other"),
    E("PostmanRuntime/7.36.0", "Postman", "Library", null, "Other"),
    E("insomnia/8.4.5", "Insomnia", "Library", null, "Other"),
    E("Dalvik/2.1.0 (Linux; U; Android 13; Pixel 7 Build/TQ3A.230901.001)",
      "Dalvik", "Library", "Android", "Other"),
    E("HTTrack Website Copier/3.49-2 (offline browser)", "HTTrack", "Offline Browser", null, "Other"),
    // ------------------------------------------------------ email clients
    E("Mozilla/5.0 (X11; Linux x86_64; rv:102.0) Gecko/20100101 Thunderbird/102.13.0",
      "Thunderbird", "Email client", "Linux", "Personal computer"),
    E("Microsoft Office/16.0 (Windows NT 10.0; Microsoft Outlook 16.0.13929; Pro)",
      "Microsoft Outlook", "Email client", "Windows", "Personal computer"),
    E("Lotus-Notes/6.0 (Windows-NT)", "Lotus Notes", "Email client", null, "Personal computer"),
    // ------------------------------------------------------- feed readers
    E("Feedly/1.0 (+http://www.feedly.com/fetcher.html; like FeedFetcher-Google)",
      "Feedly", "Feed Reader", null, "Other"),
    E("NetNewsWire/6.1.1 (Macintosh; Mac OS X 13.4.1)", "NetNewsWire", "Feed Reader", "OS X", "Other"),
    E("FreshRSS/1.22.1 (Linux; https://freshrss.org)", "FreshRSS", "Feed Reader", "Linux", "Other"),
    E("Tiny Tiny RSS/23.12 (https://tt-rss.org/)", "Tiny Tiny RSS", "Feed Reader", null, "Other"),
    // ------------------------------------------------------ media players
    E("VLC/3.0.20 LibVLC/3.0.20", "VLC media player", "Multimedia Player", null, "Personal computer"),
    E("iTunes/12.12.10 (Windows; Microsoft Windows 10 x64)", "iTunes", "Multimedia Player", null, "Personal computer"),
    E("Winamp/5.666", "Winamp", "Multimedia Player", null, "Personal computer"),
    E("Spotify/8.8.96 iOS/17.1.2 (iPhone15,2)", "Spotify", "Multimedia Player", null, "Smartphone"),
    E("Sonos/70.4-23270 (ZPS12)", "Sonos", "Multimedia Player", null, "Personal computer"),
    // --------------------------------------------------------- validators
    E("W3C_Validator/1.3 http://validator.w3.org/services", "W3C Validator", "Validator", null, "Other"),
    E("Jigsaw/2.3.0 W3C_CSS_Validator_JFouffa/2.0", "Jigsaw", "Validator", null, "Other"),
    // ---------------------------------------------------- in-app webviews
    E("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/21B91 [FBAN/FBIOS;FBAV/442.0.0.23.109;FBBV/551379933]",
      "Facebook App", "Mobile App", "iOS", "Smartphone"),
    E("Mozilla/5.0 (Linux; Android 13; SM-S918B Build/TP1A; wv) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/120.0.6099.115 Mobile Safari/537.36 [FB_IAB/FB4A;FBAV/442.0.0.31.112;]",
      "Facebook App", "Mobile App", "Android", "Smartphone"),
    E("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/15E148 Instagram 312.0.0.32.112 (iPhone14,5; iOS 17_1_1; en_US)",
      "Instagram App", "Mobile App", "iOS", "Smartphone"),
    E("Mozilla/5.0 (Linux; Android 13; 22081212C) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/116.0.0.0 Mobile Safari/537.36 XWEB/1160065 MMWEBSDK/20231202 MicroMessenger/8.0.47.2560",
      "WeChat", "Mobile App", "Android", "Smartphone"),
    E("com.zhiliaoapp.musically/2023205030 (Linux; U; Android 13; en_US; Pixel 6; Build/TQ3A; Cronet/119) musical_ly_32.5.3",
      "TikTok App", "Mobile App", "Android", "Smartphone"),
    E("Snapchat/12.33.1 (iPhone15,2; iOS 17.1.2; gzip)", "Snapchat App", "Mobile App", null, "Smartphone"),
    E("Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Mobile/15E148 Twitter for iPhone/10.24",
      "Twitter App", "Mobile App", "iOS", "Smartphone"),
    E("Mozilla/5.0 (iPhone; CPU iPhone OS 16_6 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1 Line/13.19.2",
      "LINE App", "Mobile App", "iOS", "Smartphone"),
    E("Mozilla/5.0 (iPhone; CPU iPhone OS 17_1 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.6 Mobile/15E148 Safari/604.1 GSA/292.0.579695730",
      "Google Search App", "Mobile App", "iOS", "Smartphone"),
    E("Mozilla/5.0 (Linux; Android 13) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/119.0.6045.66 Mobile DuckDuckGo/5 Safari/537.36",
      "DuckDuckGo Browser", "Mobile Browser", "Android", "Smartphone"),
    // --------------------------------------------- text / niche browsers
    E("Lynx/2.9.0dev.12 libwww-FM/2.14 SSL-MM/1.4.1", "Lynx", "Browser", null, "Personal computer"),
    E("w3m/0.5.3+git20230121", "w3m", "Browser", null, "Personal computer"),
    E("ELinks/0.17.0 (textmode; Linux 6.1.0 x86_64; 202x60-2)", "ELinks", "Browser", "Linux", "Personal computer"),
    E("Links (2.29; Linux 6.1.0-13-amd64 x86_64; GNU C 12.2; text)", "Links", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) NetSurf/3.11", "NetSurf", "Browser", "Linux", "Personal computer"),
    E("Dillo/3.0.5", "Dillo", "Browser", null, "Personal computer"),
    E("Mozilla/5.0 (X11; Linux x86_64) KHTML/5.107 (like Gecko) Konqueror/22.12 KIO/5.107",
      "Konqueror", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Epiphany/45.1",
      "GNOME Web", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux) AppleWebKit/538.15 (KHTML, like Gecko) Midori/7.0 Safari/538.15",
      "Midori", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Falkon/23.08.4 Chrome/117.0.5938.63 Safari/537.36",
      "Falkon", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.21 (KHTML, like Gecko) QupZilla/2.2.6 Safari/537.21",
      "QupZilla", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Otter/1.0.03 Safari/537.36",
      "Otter Browser", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) iCab/6.1.1 Safari/605.1.15",
      "iCab", "Browser", "OS X", "Personal computer"),
    E("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_14_6) AppleWebKit/605.1.15 (KHTML, like Gecko) OmniWeb/v622.8.0.112941",
      "OmniWeb", "Browser", "OS X", "Personal computer"),
    E("Mozilla/5.0 (Macintosh; Intel Mac OS X 10.6; rv:2.0.1) Gecko/20100101 Camino/2.1.2",
      "Camino", "Browser", "OS X", "Personal computer"),
    E("Mozilla/5.0 (Windows NT 6.1; rv:31.0) Gecko/20100101 K-Meleon/76.4.7",
      "K-Meleon", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (X11; U; Linux i686; en-US; rv:1.8.1.12) Gecko/20080129 Galeon/2.0.7",
      "Galeon", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Maxthon/5.3.8.2000 Chrome/61.0.3163.79 Safari/537.36",
      "Maxthon", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Sleipnir/6.4.17 Chrome/116.0.5845.188 Safari/537.36",
      "Sleipnir", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/110.0.5650.0 Iron/110.0.5650.0 Safari/537.36",
      "SRWare Iron", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) coc_coc_browser/119.0.150 Chrome/113.0.5672.150 Safari/537.36",
      "Coc Coc", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (Linux; Android 9; Redmi Note 5) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/92.0.4515.105 Mobile Safari/537.36 Puffin/9.10.1.51573AP",
      "Puffin", "Mobile Browser", "Android", "Smartphone"),
    E("Mozilla/5.0 (SAMSUNG; SAMSUNG-GT-S8500/S8500XXJL2; U; Bada/1.2; en-us) AppleWebKit/533.1 (KHTML, like Gecko) Dolfin/2.2 Mobile WVGA SMM-MMS/1.2.0 NexPlayer/3.0 profile/MIDP-2.1",
      "Dolphin", "Mobile Browser", "Bada", "Smartphone"),
    E("Mozilla/5.0 (Linux; Android 11; SM-A217F) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/87.0.4280.141 Mobile Safari/537.36 Dolphin/12.2.9",
      "Dolphin", "Mobile Browser", "Android", "Smartphone"),
    E("Mozilla/5.0 (Windows NT 10.0; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/63.0.3239.132 Safari/537.36 BIDUBrowser/8.7",
      "Baidu Browser", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (Windows NT 10.0; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/65.0.3325.146 Safari/537.36 SE 2.X MetaSr 1.0",
      "Sogou Explorer", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/87.0.4280.141 Safari/537.36 2345Explorer/10.9.0.21486",
      "2345 Explorer", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (Windows NT 10.0; WOW64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/57.0.2987.108 Safari/537.36 LieBaoFast/4.51.3",
      "Cheetah Browser", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (Linux; U; Android 13; zh-CN; 2211133C Build/TKQ1.220905.001) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/100.0.4896.58 Quark/6.2.2.246 Mobile Safari/537.36",
      "Quark", "Mobile Browser", "Android", "Smartphone"),
    E("Mozilla/5.0 (Linux; U; Android 13; en-us; 22011119UY Build/TP1A) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/112.0.5615.136 Mobile Safari/537.36 XiaoMi/MiuiBrowser/17.4.80522",
      "Mi Browser", "Mobile Browser", "Android", "Smartphone"),
    E("Mozilla/5.0 (Linux; Android 10; HarmonyOS; NOH-AN00; HMSCore 6.12.0.302) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/99.0.4844.88 HuaweiBrowser/13.0.5.303 Mobile Safari/537.36",
      "Huawei Browser", "Mobile Browser", "HarmonyOS", "Smartphone"),
    E("Mozilla/5.0 (Linux; Android 13; V2254A) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/110.0.5481.154 Mobile Safari/537.36 VivoBrowser/17.4.10.2",
      "Vivo Browser", "Mobile Browser", "Android", "Smartphone"),
    E("Mozilla/5.0 (Linux; U; Android 13; zh-cn; PGT-AN10 Build/TP1A) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/100.0.4896.58 HeyTapBrowser/40.8.30.1 Mobile Safari/537.36",
      "HeyTap Browser", "Mobile Browser", "Android", "Smartphone"),
    E("Mozilla/5.0 (Linux; U; Android 9; zh-cn; PACM00 Build/P00610) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/70.0.3538.80 Mobile Safari/537.36 OppoBrowser/10.5.1.2",
      "Oppo Browser", "Mobile Browser", "Android", "Smartphone"),
    E("Mozilla/5.0 (Linux; Android 10; V1962A) AppleWebKit/537.36 (KHTML, like Gecko) Version/4.0 Chrome/68.0.3440.91 Mobile Safari/537.36 Mb2345Browser/9.0",
      "2345 Browser", "Mobile Browser", "Android", "Smartphone"),
    // -------------------------------------------------- firefox rebrands
    E("Mozilla/5.0 (X11; Linux x86_64; rv:38.0) Gecko/20100101 Firefox/38.0 Iceweasel/38.3.0",
      "IceWeasel", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux x86_64; rv:102.0) Gecko/20100101 Firefox/102.0 IceCat/102.0",
      "GNU IceCat", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (Android 7.1.2; Mobile; rv:68.0) Gecko/68.0 Firefox/68.0 Fennec/68.11.0",
      "Firefox Mobile", "Mobile Browser", "Android", "Smartphone"),
    E("Mozilla/5.0 (Android 13; Mobile; rv:109.0) Gecko/121.0 Firefox/121.0 Focus/121.0",
      "Firefox Focus", "Mobile Browser", "Android", "Smartphone"),
    E("Mozilla/5.0 (Android 13; Mobile; rv:109.0) Gecko/121.0 Firefox/121.0 Klar/121.0",
      "Firefox Klar", "Mobile Browser", "Android", "Smartphone"),
    // ------------------------------------------------------------ legacy
    E("Mozilla/5.0 (X11; U; Linux x86_64; en-US) AppleWebKit/532.4 (KHTML, like Gecko) Arora/0.11.0 Safari/532.4",
      "Arora", "Browser", "Linux", "Personal computer"),
    E("Mozilla/5.0 (Windows NT 6.1; WOW64; rv:25.0) Gecko/20100101 Firefox/25.0 Lunascape/6.8.5.27371",
      "Lunascape", "Browser", "Windows", "Personal computer"),
    E("Mozilla/4.0 (compatible; MSIE 8.0; Windows NT 6.1; Avant Browser)",
      "Avant Browser", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (Windows; U; Windows NT 5.1; en-US; rv:1.7.2) Gecko/20040804 Netscape/7.2 (ax)",
      "Netscape Navigator", "Browser", "Windows", "Personal computer"),
    E("Mozilla/5.0 (Windows; U; Windows NT 6.0; en-US; rv:1.8.1.17pre) Gecko/20080716 Navigator/9.0.0.6",
      "Netscape Navigator", "Browser", "Windows", "Personal computer"),
    E("NCSA_Mosaic/2.0 (Windows 3.1)", "NCSA Mosaic", "Browser", null, "Personal computer"),
    E("Mozilla/4.0 (compatible; MSIE 6.0; Windows 98)",
      "Internet Explorer", "Browser", "Windows", "Personal computer"),
    E("Mozilla/4.0 (compatible; MSIE 5.5; Windows 95)",
      "Internet Explorer", "Browser", "Windows", "Personal computer"),
    E("Mozilla/4.0 (compatible; MSIE 6.0; Win 9x 4.90)",
      "Internet Explorer", "Browser", "Windows", "Personal computer"),
    E("Mozilla/4.0 (compatible; MSIE 6.0; Windows CE; IEMobile 7.11)",
      "Internet Explorer", "Browser", "Windows CE", "PDA"),
    // --------------------------------------------------- long-tail OSes
    E("Mozilla/5.0 (BB10; Touch) AppleWebKit/537.10+ (KHTML, like Gecko) Version/10.3.3.2205 Mobile Safari/537.10+",
      "Safari", "Browser", "BlackBerry OS", "Smartphone"),
    E("Mozilla/5.0 (PlayBook; U; RIM Tablet OS 2.1.0; en-US) AppleWebKit/536.2+ (KHTML like Gecko) Version/7.2.1.0 Safari/536.2+",
      "Safari", "Browser", "RIM Tablet OS", "Tablet"),
    E("Mozilla/5.0 (SymbianOS/9.4; Series60/5.0 NokiaN97-1/20.0.019; Profile/MIDP-2.1 Configuration/CLDC-1.1) AppleWebKit/525 (KHTML, like Gecko) BrowserNG/7.1.12344",
      null, "Browser", "Symbian OS", "Smartphone"),
    E("Mozilla/5.0 (webOS/1.4.0; U; en-US) AppleWebKit/532.2 (KHTML, like Gecko) Version/1.0 Safari/532.2 Pre/1.0",
      "Safari", "Browser", "webOS", "Smartphone"),
    E("Mozilla/5.0 (hp-tablet; Linux; hpwOS/3.0.2; U; en-US) AppleWebKit/534.6 (KHTML, like Gecko) wOSBrowser/234.40.1 Safari/534.6 TouchPad/1.0",
      null, "Browser", "webOS", "Tablet"),
    E("Mozilla/5.0 (Linux; U; Sailfish 3.0; Mobile; rv:45.0) Gecko/45.0 Firefox/45.0 SailfishBrowser/1.0",
      "Firefox", "Browser", "Sailfish OS", "Smartphone"),
    E("Mozilla/5.0 (MeeGo; NokiaN9) AppleWebKit/534.13 (KHTML, like Gecko) NokiaBrowser/8.5.0 Mobile Safari/534.13",
      null, "Browser", "MeeGo", "Smartphone"),
    E("Mozilla/5.0 (X11; U; Linux armv7l; en-GB; rv:1.9.2.3pre) Gecko/20100723 Firefox/3.5 Maemo Browser 1.7.4.8 RX-51 N900",
      "Firefox", "Browser", "Maemo", "Personal computer"),
    E("Mozilla/5.0 (X11; SunOS sun4u; rv:38.0) Gecko/38.0 Firefox/38.0",
      "Firefox", "Browser", "Solaris", "Personal computer"),
    E("Mozilla/5.0 (X11; OpenBSD amd64; rv:109.0) Gecko/20100101 Firefox/112.0",
      "Firefox", "Browser", "OpenBSD", "Personal computer"),
    E("Mozilla/5.0 (X11; NetBSD amd64; rv:120.0) Gecko/20100101 Firefox/120.0",
      "Firefox", "Browser", "NetBSD", "Personal computer"),
    E("Mozilla/5.0 (X11; DragonFly x86_64; rv:115.0) Gecko/20100101 Firefox/115.0",
      "Firefox", "Browser", "DragonFly BSD", "Personal computer"),
    E("Mozilla/5.0 (Haiku; Intel) AppleWebKit/537.36 (KHTML, like Gecko) WebPositive/1.2 Safari/537.36",
      null, "Browser", "Haiku", "Personal computer"),
    E("Mozilla/5.0 (AmigaOS; PPC; rv:31.0) Gecko/20100101 Firefox/31.0",
      "Firefox", "Browser", "AmigaOS", "Personal computer"),
    E("Mozilla/5.0 (OS/2; Warp 4.5; rv:38.0) Gecko/20100101 Firefox/38.0",
      "Firefox", "Browser", "OS/2", "Personal computer"),
    E("Mozilla/5.0 (Fuchsia) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
      "Chrome", "Browser", "Fuchsia", "Personal computer"),
    // ------------------------------------------------- distro-level linux
    E("Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "Firefox", "Browser", "Ubuntu", "Personal computer"),
    E("Mozilla/5.0 (X11; Fedora; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "Firefox", "Browser", "Fedora", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux x86_64; Debian GNU/Linux) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Epiphany/45.1",
      "GNOME Web", "Browser", "Debian", "Personal computer"),
    E("Mozilla/5.0 (X11; CentOS; Linux x86_64; rv:68.0) Gecko/20100101 Firefox/68.0",
      "Firefox", "Browser", "CentOS", "Personal computer"),
    E("Mozilla/5.0 (X11; openSUSE; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "Firefox", "Browser", "openSUSE", "Personal computer"),
    E("Mozilla/5.0 (X11; Gentoo; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "Firefox", "Browser", "Gentoo", "Personal computer"),
    E("Mozilla/5.0 (X11; Linux Mint; Linux x86_64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "Firefox", "Browser", "Linux Mint", "Personal computer"),
    // ---------------------------------------------------------- e-readers
    E("Mozilla/5.0 (Linux; U; Android 4.0; en-us; Kobo Touch) AppleWebKit/534.30 (KHTML, like Gecko) Version/4.0 Safari/534.30",
      "Safari", "Browser", "Android", "Tablet"),
    E("Mozilla/5.0 (Linux; U; Android 2.1; en-us; NOOK BNRV100) AppleWebKit/530.17 (KHTML, like Gecko) Version/4.0 Safari/530.17",
      "Safari", "Browser", "Android", "Tablet"),
    // --------------------------------------------------------- more bots
    E("Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm)",
      "bingbot", "Robot", null, "Other"),
    E("Mozilla/5.0 (compatible; AhrefsBot/7.0; +http://ahrefs.com/robot/)",
      "AhrefsBot", "Robot", null, "Other"),
    E("Mozilla/5.0 (compatible; SemrushBot/7~bl; +http://www.semrush.com/bot.html)",
      "SemrushBot", "Robot", null, "Other"),
    E("DuckDuckBot/1.1; (+http://duckduckgo.com/duckduckbot.html)",
      "DuckDuckBot", "Robot", null, "Other"))

  test(s"breadth corpus: every entry classifies as pinned (n=${corpus.size})") {
    corpus.foreach { e =>
      val got = UserAgents.parse(e.ua)
      assert(got.name === e.name, s"name for: ${e.ua}")
      assert(got.uaType === e.typ, s"type for: ${e.ua}")
      assert(got.osFamily === e.os, s"os for: ${e.ua}")
      assert(got.deviceCategory === e.device, s"device for: ${e.ua}")
    }
  }

  test("classification coverage rates across the whole corpus") {
    val parsed = corpus.map(e => UserAgents.parse(e.ua))
    def rate(f: UserAgents.UaInfo => String): Double =
      parsed.count(p => f(p) != null).toDouble / parsed.size
    // the 9 producers' non-null coverage on a deliberately long-tail corpus
    val rates = Map(
      "name" -> rate(_.name), "family" -> rate(_.family),
      "vendor" -> rate(_.vendor), "type" -> rate(_.uaType),
      "version" -> rate(_.version), "device" -> rate(_.deviceCategory),
      "os" -> rate(_.osFamily), "osVersion" -> rate(_.osVersion),
      "osVendor" -> rate(_.osVendor))
    info(rates.map { case (k, v) => f"$k=$v%.2f" }.mkString(", "))
    assert(rates("type") === 1.0, "every string gets a type")
    assert(rates("device") === 1.0, "every string gets a device category")
    assert(rates("name") >= 0.95, s"name coverage ${rates("name")}")
    assert(rates("version") >= 0.90, s"version coverage ${rates("version")}")
    assert(rates("os") >= 0.60, s"os coverage ${rates("os")} " +
      "(libraries/validators legitimately carry no OS)")
    // OS coverage restricted to strings that DO carry an OS indicator
    val withOsExpectation = corpus.filter(_.os != null)
    val osHit = withOsExpectation.count(e => UserAgents.parse(e.ua).osFamily != null)
    assert(osHit === withOsExpectation.size)
  }
}
