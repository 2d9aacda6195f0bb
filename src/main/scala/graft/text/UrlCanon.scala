package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** URL canonicalization — the dedup grain ABOVE content: a crawl-scale
  * corpus (reference: the scraper's URL builders, `src/utils/helpers.py`
  * buildVenueUrl/buildArtistUrl family) sees the same page under many
  * surface forms (scheme/host case, default ports, fragments, tracking
  * params, param order, trailing slashes). Canonicalizing BEFORE fetch
  * and before content dedup removes whole duplicate fetches for the
  * cost of a projection — at 100 TB the cheapest dedup is the one that
  * runs on the 100-byte key instead of the 100 KB document.
  *
  * Rules applied (each documented where it deviates from a plain
  * parse):
  *   1. scheme and host lowercased; userinfo (`user:pw@`) dropped;
  *   2. default ports stripped (http:80, https:443);
  *   3. fragment dropped;
  *   4. tracking params removed — names starting with `utm_` plus the
  *      exact set [[TrackingExact]] (case-insensitive name match);
  *   5. remaining query params sorted byte-wise by their full `k=v`
  *      text (a STABLE total order; real-world equal-key repeats keep a
  *      deterministic form);
  *   6. trailing `/` stripped from a non-root path; empty path becomes
  *      `/` so `http://h` and `http://h/` unify;
  *   7. empty query drops its `?`.
  *
  *   8. SAFE percent-decoding in path and query (RFC 3986 §2.3: a
  *      %-encoded UNRESERVED octet — ALPHA / DIGIT / `-._~` — is
  *      equivalent to the raw char, so `%70` ≡ `p`); reserved or
  *      non-ASCII octets stay encoded with their hex UPPERCASED
  *      (`%2f` → `%2F`), and malformed sequences pass through
  *      untouched. Both directions keep idempotence.
  *
  * NOT done (documented limits, each a deliberate no-risk default):
  * decoding reserved octets (that CAN change semantics), IDN/punycode
  * folding, path `//` collapsing, `index.html` stripping.
  *
  * Returns None (SQL NULL) for strings with no `scheme://host` shape —
  * the NULL-dispatch contract every cell-level decoder in this repo
  * follows: one malformed URL must never fail a scan.
  */
object UrlCanon {

  /** Exact tracking-param names (checked lowercased), beyond `utm_*`.
    * Deliberately EXCLUDES "ref": on many real sites `?ref=` is a
    * semantic routing/branch parameter (e.g. `?ref=main` on a code
    * host) — stripping it would conflate genuinely distinct URLs.
    * Callers that know their corpus uses `ref` for attribution can
    * pass an extended set to [[canonicalize]]. */
  val TrackingExact: Set[String] =
    Set("fbclid", "gclid", "msclkid", "igshid", "mc_cid", "mc_eid")

  private def isTracking(name: String, exact: Set[String]): Boolean = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    n.startsWith("utm_") || exact.contains(n)
  }

  private def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') || b == '-' || b == '.' || b == '_' || b == '~'

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode %-encoded UNRESERVED octets, uppercase the hex of the
    * rest, pass malformed sequences through. Idempotent. */
  private[graft] def normalizePercent(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val h1 = if (c == '%' && i + 2 < s.length) hexVal(s.charAt(i + 1)) else -1
      val h2 = if (h1 >= 0) hexVal(s.charAt(i + 2)) else -1
      if (h1 >= 0 && h2 >= 0) {
        val b = h1 * 16 + h2
        if (isUnreserved(b)) out.append(b.toChar)
        else out.append('%')
          .append(Character.toUpperCase(s.charAt(i + 1)))
          .append(Character.toUpperCase(s.charAt(i + 2)))
        i += 3
      } else { out.append(c); i += 1 } // malformed or bare %: pass through
    }
    out.toString
  }

  /** Canonical form, or None when `url` has no scheme://host shape. */
  def canonicalize(url: String): Option[String] =
    canonicalize(url, TrackingExact)

  /** As [[canonicalize]] with a caller-supplied exact tracking-name
    * set (checked lowercased; `utm_*` prefixes are always stripped). */
  def canonicalize(url: String, trackingExact: Set[String]): Option[String] = {
    if (url == null) return None
    val sep = url.indexOf("://")
    if (sep <= 0) return None
    val scheme = url.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    if (!scheme.forall(c => c.isLetter || c.isDigit || c == '+' || c == '-' || c == '.')) return None
    val rest = url.substring(sep + 3)
    // authority ends at the first /, ? or #
    var aEnd = rest.length
    var i = 0
    while (i < aEnd) {
      val c = rest.charAt(i)
      if (c == '/' || c == '?' || c == '#') { aEnd = i } else i += 1
    }
    var auth = rest.substring(0, aEnd)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1) // drop userinfo
    if (auth.isEmpty) return None
    // an IPv6 literal authority is bracketed ([::1]:8080) — the port
    // colon is the one AFTER ']', never a colon inside the brackets
    val colon =
      if (auth.charAt(0) == '[') {
        val close = auth.indexOf(']')
        if (close < 0) return None // unterminated bracket: malformed
        if (close + 1 < auth.length) {
          if (auth.charAt(close + 1) != ':') return None // "[..]junk"
          close + 1
        } else -1
      } else auth.indexOf(':')
    var host = if (colon >= 0) auth.substring(0, colon) else auth
    host = host.toLowerCase(java.util.Locale.ROOT)
    if (host.isEmpty) return None
    if (host.charAt(0) == '[' &&
        (host.length < 3 || host.last != ']' ||
         !host.view.slice(1, host.length - 1)
              .forall(c => hexVal(c) >= 0 || c == ':' || c == '.')))
      return None // bracketed host must be a plausible IPv6 literal
    val port: Option[Int] =
      if (colon < 0) None
      else {
        val p = auth.substring(colon + 1)
        if (p.isEmpty || !p.forall(_.isDigit)) return None
        try Some(p.toInt) catch { case _: NumberFormatException => return None }
      }
    val keepPort = port match {
      case Some(80) if scheme == "http"   => None
      case Some(443) if scheme == "https" => None
      case other                          => other
    }
    // path [?query] [#fragment]
    val tail = rest.substring(aEnd)
    val hash = tail.indexOf('#')
    val noFrag = if (hash >= 0) tail.substring(0, hash) else tail
    val q = noFrag.indexOf('?')
    var path = if (q >= 0) normalizePercent(noFrag.substring(0, q))
               else normalizePercent(noFrag)
    val query = if (q >= 0) noFrag.substring(q + 1) else ""
    if (path.isEmpty) path = "/"
    if (path.length > 1 && path.endsWith("/")) path = path.dropRight(1)
    // percent-normalize BEFORE the tracking filter and the sort, so an
    // encoded `ut%6D_source` cannot sneak past the filter and the
    // canonical order is over decoded forms
    val params = query.split("&").iterator
      .filter(_.nonEmpty)
      .map(normalizePercent)
      .filterNot(p => isTracking(p.takeWhile(_ != '='), trackingExact))
      .toArray
    java.util.Arrays.sort(params, java.util.Comparator.naturalOrder[String]())
    val qs = if (params.isEmpty) "" else "?" + params.mkString("&")
    val ps = keepPort.map(":" + _).getOrElse("")
    Some(s"$scheme://$host$ps$path$qs")
  }

  /** Registered domain (eTLD+1) by longest-suffix match against a
    * suffix list — the key domain caps and per-site budgets group on
    * ("one more label than the longest matching public suffix", the
    * publicsuffix.org algorithm). `suffixes` ships as a plain Set the
    * closure broadcasts with the task — the real list is ~9k entries,
    * still trivially a broadcast variable at scale.
    *
    * None when the host IS a bare suffix or matches nothing — callers
    * decide whether unmatched hosts group as themselves.
    */
  def registeredDomain(host: String, suffixes: Set[String]): Option[String] = {
    if (host == null || host.isEmpty) return None
    val h = host.toLowerCase(java.util.Locale.ROOT)
    val labels = h.split('.')
    if (labels.exists(_.isEmpty)) return None
    // a host that IS a public suffix has no registered domain
    // (publicsuffix.org: github.io itself registers nothing)
    if (suffixes.contains(h)) return None
    // longest suffix in the list that is a proper suffix of the host
    var best = -1 // number of labels in the matched suffix
    var k = 1
    while (k < labels.length) { // proper: at least one label remains
      val cand = labels.takeRight(k).mkString(".")
      if (suffixes.contains(cand)) best = k
      k += 1
    }
    if (best < 0) None
    else Some(labels.takeRight(best + 1).mkString("."))
  }

  /** `url_canon(url)` — canonical URL, NULL for unparseable cells. */
  val canon: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) => canonicalize(s).orNull }

  /** `registered_domain(host)` with a fixed suffix set (curried so the
    * set is captured once per plan, broadcast with the closure). */
  def registeredDomainUdf(suffixes: Set[String])
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (h: String) => registeredDomain(h, suffixes).orNull }

  /** Host part of a canonical URL (after [[canonicalize]]); NULL when
    * the URL is unparseable. */
  val host: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      canonicalize(s).map { c =>
        val a = c.indexOf("://") + 3
        var e = a
        while (e < c.length && c.charAt(e) != '/' && c.charAt(e) != '?') e += 1
        val h = c.substring(a, e)
        // bracketed IPv6: the port colon is after ']', inner ones bind
        val colon = if (h.startsWith("[")) {
          val close = h.indexOf(']')
          if (close >= 0 && close + 1 < h.length) close + 1 else -1
        } else h.indexOf(':')
        if (colon >= 0) h.substring(0, colon) else h
      }.orNull
    }
}
