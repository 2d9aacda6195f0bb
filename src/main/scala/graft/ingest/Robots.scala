package graft.ingest

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** robots.txt evaluation (RFC 9309) — the crawl-permission gate: a
  * pipeline that replays or extends a web corpus must decide, per
  * (host, path), whether fetching was allowed. The reference scrapes a
  * single known-friendly site (`src/scraper/service.py`); a 100 TB
  * crawl generalizes that to per-host rule evaluation, which is a
  * per-row function of two strings — a projection, no shuffle.
  *
  * Semantics implemented (the RFC's, including the parts naive
  * implementations get wrong — each is spec-pinned in RobotsSpec):
  *   - groups: consecutive `User-agent:` lines share the following
  *     rule block; the group chosen is the one matching the caller's
  *     agent token (case-insensitive), falling back to the `*` group;
  *     if BOTH exist the specific group wins and the `*` group is NOT
  *     merged in;
  *   - rule match: case-sensitive path prefix with `*` (any chars,
  *     backtracking) and `$` (end anchor) metacharacters;
  *   - precedence: LONGEST pattern wins; tie → Allow wins;
  *   - empty `Disallow:` means allow-all; no matching rule → allowed;
  *     no robots / unparseable → allowed (the RFC's 4xx behavior);
  *   - field names case-insensitive, `#` comments stripped, CR
  *     tolerated.
  */
object Robots {

  private final case class Rule(allow: Boolean, pattern: String)
  private final case class Group(agents: Seq[String], rules: Seq[Rule],
                                 delay: Option[Double])

  private def parse(txt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var delay = Option.empty[Double]
    var inHeader = true // consecutive UA lines accumulate
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.reverse, rules.reverse, delay)
      agents = Nil; rules = Nil; delay = None
    }
    txt.split('\n').foreach { raw =>
      val line = {
        val noCr = raw.stripSuffix("\r")
        val hash = noCr.indexOf('#')
        (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inHeader) { flush(); inHeader = true }
            agents ::= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" if agents.nonEmpty =>
            inHeader = false
            // empty Disallow => allow-all: representable as no rule
            if (value.nonEmpty) rules ::= Rule(field == "allow", value)
          case "crawl-delay" if agents.nonEmpty =>
            // non-standard but ubiquitous; numeric seconds (fractional
            // allowed); a malformed value is ignored like any unknown
            inHeader = false
            delay = value.toDoubleOption.filter(d => d >= 0 && d.isFinite)
              .orElse(delay)
          case _ => () // sitemap (global, see sitemaps()), unknown: ignored
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** `pattern` against `path`: prefix match with `*`/`$`. Greedy
    * last-star matching — O(|pattern|·|path|) WORST case, linear in
    * practice — never the exponential recursive backtracking a
    * crafted robots.txt (a `*a*a*a*a…$` rule against a long path)
    * could weaponize into a per-row DoS inside a corpus scan
    * (RobotsSpec pins the adversarial case). An unanchored pattern
    * matches a PREFIX of the path, which is exactly full-matching
    * `pattern + "*"`. */
  private[graft] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val base = if (anchored) pattern.dropRight(1) else pattern
    val pat = if (anchored) base else base + "*"
    var pi = 0
    var si = 0
    var star = -1
    var mark = 0
    while (si < path.length) {
      if (pi < pat.length && pat.charAt(pi) == '*') {
        star = pi; mark = si; pi += 1
      } else if (pi < pat.length && pat.charAt(pi) == path.charAt(si)) {
        pi += 1; si += 1
      } else if (star >= 0) {
        mark += 1; si = mark; pi = star + 1
      } else return false
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length
  }

  /** The allow/deny verdict for (robots body, agent token, path). */
  def isAllowed(robotsTxt: String, agent: String, path: String): Boolean = {
    if (robotsTxt == null || path == null) return true
    val groups = parse(robotsTxt)
    val a = if (agent == null) "" else agent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.filter(_.agents.contains(a))
    val chosen =
      if (specific.nonEmpty) specific
      else groups.filter(_.agents.contains("*"))
    if (chosen.isEmpty) return true
    // longest matching pattern across the chosen group(s); tie -> Allow
    var bestLen = -1
    var bestAllow = true
    chosen.iterator.flatMap(_.rules).foreach { r =>
      if (patternMatches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }

  /** `Sitemap:` directive values — GLOBAL per the sitemaps.org
    * protocol (they belong to no User-agent group), collected in
    * document order, verbatim (they are absolute URLs). The link from
    * the permission file to the frontier-coverage audit (q301/q303):
    * real crawlers discover most sitemaps exactly here. */
  def sitemaps(robotsTxt: String): Seq[String] = {
    if (robotsTxt == null) return Seq.empty
    robotsTxt.split('\n').iterator.flatMap { raw =>
      val noCr = raw.stripSuffix("\r")
      val hash = noCr.indexOf('#')
      val line = (if (hash >= 0) noCr.substring(0, hash) else noCr).trim
      val colon = line.indexOf(':')
      if (colon > 0 &&
        line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT) == "sitemap") {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.toSeq
  }

  /** Per-agent `Crawl-delay` seconds, with the SAME group selection as
    * [[isAllowed]] (specific group wins, `*` fallback, no merge); None
    * when the chosen group declares none. The per-host politeness
    * budget a frontier scheduler divides fetches by. */
  def crawlDelay(robotsTxt: String, agent: String): Option[Double] = {
    if (robotsTxt == null) return None
    val groups = parse(robotsTxt)
    val a = if (agent == null) "" else agent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.filter(_.agents.contains(a))
    val chosen =
      if (specific.nonEmpty) specific
      else groups.filter(_.agents.contains("*"))
    chosen.flatMap(_.delay).headOption
  }

  /** `robots_sitemaps(robots)` column form. */
  val sitemapsUdf: UserDefinedFunction =
    udf { (robots: String) => sitemaps(robots) }

  /** `crawl_delay(robots, agent)` column form (NULL = none declared). */
  val crawlDelayUdf: UserDefinedFunction =
    udf { (robots: String, agent: String) =>
      crawlDelay(robots, agent)
        .map(java.lang.Double.valueOf).orNull
    }

  /** `robots_allowed(robots, agent, path)` column form. */
  val allowedUdf: UserDefinedFunction =
    udf { (robots: String, agent: String, path: String) =>
      isAllowed(robots, agent, path)
    }
}
