package graft

import graft.ingest.Robots

class RobotsSpec extends SparkSpec {

  private val robots =
    """# synthetic robots
      |User-agent: graftbot
      |Disallow: /private/
      |Allow: /private/public*
      |Disallow: /data/*.json$
      |
      |User-agent: otherbot
      |User-agent: *
      |Disallow: /
      |Allow: /open
      |""".stripMargin

  private def ok(agent: String, path: String): Boolean =
    Robots.isAllowed(robots, agent, path)

  test("specific group wins; * group is NOT merged in") {
    assert(ok("graftbot", "/anything"))        // no graftbot rule matches
    assert(!ok("randombot", "/anything"))      // * group: Disallow /
    assert(ok("randombot", "/open/page"))      // * group: Allow /open
    assert(!ok("otherbot", "/anything"))       // shares the * group header
  }

  test("longest match wins; tie goes to Allow") {
    assert(!ok("graftbot", "/private/x"))          // Disallow /private/
    assert(ok("graftbot", "/private/publicX"))     // longer Allow pattern
    val tie = "User-agent: a\nDisallow: /p\nAllow: /p\n"
    assert(Robots.isAllowed(tie, "a", "/page"))    // equal length -> Allow
  }

  test("wildcards backtrack and $ anchors") {
    assert(!ok("graftbot", "/data/x.json"))        // *.json$ matches
    assert(ok("graftbot", "/data/x.json2"))        // anchor blocks suffix
    assert(Robots.patternMatches("/a*b*c", "/aXbYbZc"))
    assert(Robots.patternMatches("/a*b*c", "/aXbYc2")) // prefix match
    assert(!Robots.patternMatches("/a*b*c", "/aXbY2")) // no c anywhere
    assert(Robots.patternMatches("/a*b*c$", "/abbc"))
    assert(!Robots.patternMatches("/a*b*c$", "/abbcx"))
  }

  test("defaults: empty Disallow, no match, no robots, no group") {
    assert(Robots.isAllowed("User-agent: *\nDisallow:\n", "x", "/q"))
    assert(Robots.isAllowed("User-agent: b\nDisallow: /\n", "a", "/q"))
    assert(Robots.isAllowed(null, "a", "/q"))
    assert(Robots.isAllowed("", "a", "/q"))
    assert(Robots.isAllowed("not a robots file at all", "a", "/q"))
  }

  test("field names case-insensitive, CRLF and comments tolerated") {
    val r = "USER-AGENT: Bot\r\nDISALLOW: /x # trailing comment\r\n"
    assert(!Robots.isAllowed(r, "bot", "/xyz"))
    assert(Robots.isAllowed(r, "bot", "/y"))
  }

  test("agent matching is case-insensitive") {
    assert(!ok("GraftBot", "/private/a"))
  }

  test("adversarial wildcard pattern completes fast (no exponential backtracking)") {
    val pat = "/" + ("*a" * 20) + "$"
    val path = "/" + ("a" * 2000) + "b" // the $ anchor fails on the 'b'
    val t0 = System.nanoTime()
    assert(!Robots.patternMatches(pat, path))
    assert(Robots.patternMatches("/" + ("*a" * 20), "/" + ("a" * 2000)))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 1000.0, s"wildcard match took ${ms}ms — backtracking blow-up")
  }

  test("rules before any User-agent line are ignored, not crashed on") {
    val r = "Disallow: /\nUser-agent: *\nAllow: /\n"
    assert(Robots.isAllowed(r, "any", "/page"))
  }

  test("Sitemap: directives are global — collected regardless of group position") {
    val r = "Sitemap: https://a.com/s1.xml\n" +
      "User-agent: graftbot\nDisallow: /x\n" +
      "Sitemap: https://a.com/s2.xml # trailing comment\n" +
      "User-agent: *\nDisallow: /\n" +
      "sitemap: https://a.com/s3.xml\r\n" // case-insensitive field, CR
    assert(Robots.sitemaps(r) == Seq("https://a.com/s1.xml",
      "https://a.com/s2.xml", "https://a.com/s3.xml"))
    assert(Robots.sitemaps(null).isEmpty)
    assert(Robots.sitemaps("User-agent: *\nDisallow:\n").isEmpty)
  }

  test("Crawl-delay: per-group, same selection as isAllowed, malformed ignored") {
    val r = "User-agent: graftbot\nDisallow: /x\nCrawl-delay: 1.5\n\n" +
      "User-agent: *\nDisallow: /\nCrawl-delay: 10\n"
    assert(Robots.crawlDelay(r, "GraftBot").contains(1.5)) // case-insensitive
    assert(Robots.crawlDelay(r, "otherbot").contains(10.0)) // * fallback
    // specific group WITHOUT a delay does not inherit the * group's
    val r2 = "User-agent: graftbot\nDisallow: /x\n\n" +
      "User-agent: *\nCrawl-delay: 10\n"
    assert(Robots.crawlDelay(r2, "graftbot").isEmpty)
    assert(Robots.crawlDelay(r2, "other").contains(10.0))
    // malformed / negative values ignored
    assert(Robots.crawlDelay(
      "User-agent: *\nCrawl-delay: soon\n", "x").isEmpty)
    assert(Robots.crawlDelay(
      "User-agent: *\nCrawl-delay: -3\n", "x").isEmpty)
    assert(Robots.crawlDelay(null, "x").isEmpty)
  }
}
