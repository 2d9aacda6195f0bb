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
}
