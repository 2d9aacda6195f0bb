package graft.extract

import org.apache.spark.sql.functions.udf

/** Generic `<a href>` extraction — the discovery half of the frontier
  * loop: a crawl grows by extracting every fetched page's anchors,
  * resolving them against the page URL (graft.text.UrlResolve), and
  * feeding the survivors through canon → robots → dedup. The
  * reference does this with BeautifulSoup's find_all over venue pages
  * (`/root/reference/src/extractor/service.py:344-445` href loop);
  * this is the corpus-generic version — ANY page's anchors, not one
  * site's known selectors (that site-specific path stays in
  * [[HtmlParse]]).
  *
  * Extraction rules (deterministic subset of the HTML5 tree builder):
  *   - a tag starts at `<a` / `<A` when the next char is whitespace,
  *    `/` or `>`; the tag body ends at the first `>` OUTSIDE a quoted
  *     attribute value (a quoted `>` inside an href must not split
  *     the tag);
  *   - attributes parse as name[=value] with single/double/un-quoted
  *     values; the FIRST `href` wins (HTML5: later duplicate
  *     attributes are ignored);
  *   - the value gets character references decoded
  *     (graft.text.HtmlEntities — `&amp;` in query strings is the
  *     single most common entity on the web) and ASCII whitespace
  *     trimmed (the HTML URL-attribute rule);
  *   - anchors without an href, or with an empty one after trim, are
  *     dropped (an empty href self-references; a crawler never
  *     re-enqueues the page it just fetched);
  *   - [[MaxLinks]] caps the output (link-farm bomb guard — past-cap
  *     anchors are dropped, never an exception).
  *
  * Returned in DOCUMENT ORDER, duplicates preserved — dedup is the
  * frontier's job (after canon, where duplicates actually collapse).
  *
  * Scale: one linear pass per page, a pure per-row projection riding
  * the fetch scan's partitioning.
  */
object Outlinks {

  /** Per-page anchor budget (link-farm guard). */
  val MaxLinks: Int = 10000

  /** All href values of `<a>` tags, document order, entity-decoded,
    * whitespace-trimmed, empties dropped. Never throws; null → empty. */
  def hrefs(html: String): Seq[String] = {
    if (html == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = html.length
    while (i < n && out.size < MaxLinks) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 2 > n) return out.toSeq
      val c1 = if (lt + 1 < n) html.charAt(lt + 1) else ' '
      val c2 = if (lt + 2 < n) html.charAt(lt + 2) else '>'
      if ((c1 == 'a' || c1 == 'A') &&
        (c2.isWhitespace || c2 == '/' || c2 == '>')) {
        val end = tagEnd(html, lt + 2)
        hrefOf(html, lt + 2, end).foreach { raw =>
          val v = graft.text.HtmlEntities.decode(raw).trim
          if (v.nonEmpty) out += v
        }
        i = end
      } else i = lt + 1
    }
    out.toSeq
  }

  /** Index just past the tag's closing `>`, quote-aware. */
  private def tagEnd(s: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i + 1
      i += 1
    }
    i
  }

  /** First href attribute value in s[from, until), raw (undecoded). */
  private def hrefOf(s: String, from: Int, until: Int): Option[String] = {
    var i = from
    while (i < until) {
      while (i < until && (s.charAt(i).isWhitespace || s.charAt(i) == '/')) i += 1
      val n0 = i
      while (i < until && !s.charAt(i).isWhitespace && s.charAt(i) != '=' &&
        s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
      if (i == n0) { i += 1 }
      else {
        val name = s.substring(n0, i)
        while (i < until && s.charAt(i).isWhitespace) i += 1
        var value: String = null
        if (i < until && s.charAt(i) == '=') {
          i += 1
          while (i < until && s.charAt(i).isWhitespace) i += 1
          if (i < until && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i); i += 1
            val v0 = i
            while (i < until && s.charAt(i) != q) i += 1
            value = s.substring(v0, i)
            if (i < until) i += 1
          } else {
            val v0 = i
            while (i < until && !s.charAt(i).isWhitespace && s.charAt(i) != '>') i += 1
            value = s.substring(v0, i)
          }
        }
        if (name.equalsIgnoreCase("href") && value != null) return Some(value)
      }
    }
    None
  }

  /** `outlinks(html)` — array of href strings, document order. */
  val hrefsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (html: String) => hrefs(html) }

  /** Per-anchor visible-text budget (raw chars collected before
    * decode — a link farm wrapping the whole page in one `<a>` costs
    * bounded work, the [[MaxLinks]] precedent at char grain). */
  val MaxTextChars: Int = 4096

  /** `(href, text)` pairs for every href-carrying anchor, document
    * order — the signal half of an anchor-text index: what OTHER
    * pages call a target is a ranking/quality feature the href alone
    * doesn't carry.
    *
    * Text rules (same deterministic-subset discipline as [[hrefs]]):
    *   - the text region runs from the opening tag's `>` to the first
    *     `</a` close tag OR the next `<a` open tag (HTML5's implicit
    *     close — anchors never nest) OR end of input;
    *   - markup inside the region is stripped (quote-aware, the
    *     [[tagEnd]] scanner), character data is kept;
    *   - the collected text gets character references decoded, then
    *     ASCII whitespace runs collapse to one space and ends trim —
    *     `<b>bold</b>\n  link` reads "bold link";
    *   - an anchor with an href but no visible text yields `""` (an
    *     image link is real signal for the frontier even with no
    *     text — callers filter, this never drops the href);
    *   - region collection caps at [[MaxTextChars]] raw chars.
    *
    * Invariant (property-pinned): `anchors(h).map(_._1) == hrefs(h)`
    * — adding text never changes link discovery. */
  def anchors(html: String): Seq[(String, String)] = {
    if (html == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    val n = html.length
    while (i < n && out.size < MaxLinks) {
      val lt = html.indexOf('<', i)
      if (lt < 0 || lt + 2 > n) return out.toSeq
      val c1 = if (lt + 1 < n) html.charAt(lt + 1) else ' '
      val c2 = if (lt + 2 < n) html.charAt(lt + 2) else '>'
      if ((c1 == 'a' || c1 == 'A') &&
        (c2.isWhitespace || c2 == '/' || c2 == '>')) {
        val end = tagEnd(html, lt + 2)
        hrefOf(html, lt + 2, end).foreach { raw =>
          val v = graft.text.HtmlEntities.decode(raw).trim
          if (v.nonEmpty) out += ((v, anchorText(html, end)))
        }
        i = end
      } else i = lt + 1
    }
    out.toSeq
  }

  /** Collect character data from `from` to the anchor's close (see
    * [[anchors]] rules), strip tags, decode, collapse whitespace. */
  private def anchorText(s: String, from: Int): String = {
    val sb = new StringBuilder
    var i = from
    var done = false
    while (!done && i < s.length && sb.length < MaxTextChars) {
      val c = s.charAt(i)
      if (c == '<') {
        val c1 = if (i + 1 < s.length) s.charAt(i + 1) else ' '
        val c2 = if (i + 2 < s.length) s.charAt(i + 2) else '>'
        if (c1 == '/' && (c2 == 'a' || c2 == 'A') &&
          (i + 3 >= s.length || s.charAt(i + 3) == '>' ||
            s.charAt(i + 3).isWhitespace)) done = true // explicit close
        else if ((c1 == 'a' || c1 == 'A') &&
          (c2.isWhitespace || c2 == '/' || c2 == '>')) done = true // implicit
        else i = tagEnd(s, i + 1) // strip inner markup
      } else { sb.append(c); i += 1 }
    }
    graft.text.HtmlEntities.decode(sb.toString)
      .replaceAll("\\s+", " ").trim
  }

  /** `anchor_pairs(html)` — array of `(href, text)` structs. */
  val anchorsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (html: String) => anchors(html) }
}
