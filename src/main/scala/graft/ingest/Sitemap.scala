package graft.ingest

import org.apache.spark.sql.functions.udf

/** Sitemap parsing (sitemaps.org protocol) — the crawl frontier's
  * OTHER input: robots.txt says where a crawler may NOT go
  * ([[Robots]]), sitemap.xml says where the site WANTS it to go. A
  * frontier-coverage audit (which advertised URLs did the crawl
  * actually fetch?) needs `<urlset>` entry extraction plus
  * `<sitemapindex>` expansion, because large sites ship a root index
  * pointing at per-section child sitemaps.
  *
  * Parsing is a single linear scan for the four elements the protocol
  * defines (`<url><loc><lastmod>` under `<urlset>`, `<sitemap><loc>`
  * under `<sitemapindex>`), NOT a general XML parser: sitemap files
  * are machine-generated, the protocol forbids nesting beyond this
  * shape, and a linear scan can't be bombed by attribute tricks or
  * entity expansion (loc text gets only the XML five unescaped,
  * everything else verbatim). Bomb caps: [[MaxEntries]] entries and
  * [[MaxBytes]] input bytes, both protocol limits (50k URLs / 50 MB
  * uncompressed) scaled to this engine's test budget; past-cap
  * entries are DROPPED, never an exception (the NULL-dispatch
  * contract at entry grain).
  *
  * Scale: per-row projection over one sitemap cell (a site's sitemap
  * is one row of a `binaryFile`/staging scan); index expansion is a
  * bounded self-join in the query, depth ≤ 1 per the protocol ("you
  * can't nest index files").
  */
object Sitemap {

  /** Protocol cap is 50,000 URLs per file; same bound here. */
  val MaxEntries: Int = 50000

  /** Protocol cap is 50 MB uncompressed; same bound here. */
  val MaxBytes: Int = 50 << 20

  /** One `<url>` entry: location plus optional lastmod (verbatim
    * string — W3C datetime validation is the caller's join key
    * decision, not the parser's). */
  final case class Entry(loc: String, lastmod: String)

  /** XML five unescape for loc/lastmod text (the protocol REQUIRES
    * locs be entity-escaped; `&amp;` in a URL is the common case). */
  private def unescape(s: String): String =
    if (s.indexOf('&') < 0) s
    else s.replace("&amp;", "\u0000").replace("&lt;", "<")
      .replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("\u0000", "&")

  private def textOf(xml: String, from: Int, until: Int, tag: String): Option[String] = {
    val open = xml.indexOf("<" + tag + ">", from)
    if (open < 0 || open >= until) return None
    val start = open + tag.length + 2
    val close = xml.indexOf("</" + tag + ">", start)
    if (close < 0 || close > until) return None
    Some(unescape(xml.substring(start, close).trim))
  }

  /** All `<url>` entries of a urlset document (empty for an index
    * document or malformed input — never throws). */
  def parseUrlset(xml: String): Seq[Entry] =
    parseBlocks(xml, "url").flatMap { case (b0, b1, x) =>
      textOf(x, b0, b1, "loc").map(l => Entry(l, textOf(x, b0, b1, "lastmod").getOrElse("")))
    }

  /** All child-sitemap locs of a sitemapindex document. */
  def parseIndex(xml: String): Seq[String] =
    parseBlocks(xml, "sitemap").flatMap { case (b0, b1, x) =>
      textOf(x, b0, b1, "loc")
    }

  /** True when the document's root element is `<sitemapindex>`. */
  def isIndex(xml: String): Boolean =
    xml != null && {
      val i = firstElement(xml)
      i >= 0 && xml.startsWith("<sitemapindex", i)
    }

  private def firstElement(xml: String): Int = {
    var i = 0
    val n = math.min(xml.length, 4096)
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0 || lt + 1 >= n) return -1
      val c = xml.charAt(lt + 1)
      if (c == '?' || c == '!') i = lt + 1 // prolog / comment / doctype
      else return lt
    }
    -1
  }

  /** (blockStart, blockEnd, doc) for each `<tag>...</tag>` block, in
    * document order, bomb-capped. */
  private def parseBlocks(xml: String, tag: String): Seq[(Int, Int, String)] = {
    if (xml == null || xml.length > MaxBytes) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    val openTag = "<" + tag + ">"
    val closeTag = "</" + tag + ">"
    var i = 0
    while (out.size < MaxEntries) {
      val open = xml.indexOf(openTag, i)
      if (open < 0) return out.toSeq
      val close = xml.indexOf(closeTag, open)
      if (close < 0) return out.toSeq // truncated block: drop, stop
      out += ((open, close, xml))
      i = close + closeTag.length
    }
    out.toSeq
  }

  /** XML five escape for loc/lastmod text on the write side. */
  private def escape(s: String): String =
    if (!s.exists(c => c == '&' || c == '<' || c == '>' || c == '"' || c == '\''))
      s
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")

  /** Deterministic urlset writer (the round-trip counterpart of
    * [[parseUrlset]], the same convention as Warc/Tar: archives this
    * engine emits are a pure function of their entries). Empty lastmod
    * omits the element. Enforces the caps the reader enforces, so a
    * written document always reads back whole. */
  def writeUrlset(entries: Seq[Entry]): String = {
    require(entries.size <= MaxEntries,
      s"urlset too large: ${entries.size} > $MaxEntries")
    val sb = new java.lang.StringBuilder()
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    entries.foreach { e =>
      sb.append(" <url><loc>").append(escape(e.loc)).append("</loc>")
      if (e.lastmod.nonEmpty)
        sb.append("<lastmod>").append(escape(e.lastmod)).append("</lastmod>")
      sb.append("</url>\n")
    }
    sb.append("</urlset>\n")
    val out = sb.toString
    require(out.length <= MaxBytes, s"urlset too large: ${out.length} bytes")
    out
  }

  /** `sitemap_urls(xml)` — array of `[loc, lastmod]` pairs. */
  val urlsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (xml: String) =>
      parseUrlset(xml).map(e => (e.loc, e.lastmod)) }

  /** `sitemap_children(xml)` — child locs when the doc is an index. */
  val childrenUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (xml: String) =>
      if (isIndex(xml)) parseIndex(xml) else Seq.empty[String] }

  /** `sitemap_write(array<struct<loc,lastmod>>)` — a deterministic
    * urlset document ([[writeUrlset]]; callers sort_array the entries
    * so the bytes are a pure function of the set). */
  val writeUrlsetUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (entries: Seq[(String, String)]) =>
      writeUrlset(entries.map(e => Entry(e._1, e._2)))
    }

  /** scheme://host[:port] of a URL, lowercased — the sitemaps.org
    * "same site" grain (the protocol's location rule is
    * path-prefix-scoped too, but cross-HOST references are the attack
    * the guard exists for: an index must not be able to enlist a
    * foreign host's fetch budget). None for non-absolute locs. */
  private[graft] def siteOf(url: String): Option[String] = {
    if (url == null) return None
    val sep = url.indexOf("://")
    if (sep <= 0) return None
    var e = sep + 3
    while (e < url.length && url.charAt(e) != '/' && url.charAt(e) != '?' &&
      url.charAt(e) != '#') e += 1
    if (e == sep + 3) None
    else Some(url.substring(0, e).toLowerCase(java.util.Locale.ROOT))
  }

  /** `sitemap_children_checked(parent_url, xml)` — child locs of an
    * index, SAME-HOST ONLY (sitemaps.org: a Sitemap index file can
    * only reference Sitemaps on its own site; a cross-host loc is
    * dropped, never followed). Empty for urlset docs and for a parent
    * URL with no host. Depth is the CALLER's contract: the protocol
    * forbids an index referencing another index, so expansion is one
    * level — enforce it by taking entries from children only via
    * [[urlsUdf]] (which returns empty for an index doc, so a nested
    * index contributes NOTHING rather than recursing). Spec-pinned in
    * SitemapSpec (cross-host rejection, nested-index rejection). */
  val childrenCheckedUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (parentUrl: String, xml: String) =>
      siteOf(parentUrl) match {
        case None => Seq.empty[String]
        case Some(site) =>
          if (!isIndex(xml)) Seq.empty[String]
          else parseIndex(xml).filter(c => siteOf(c).contains(site))
      }
    }
}
