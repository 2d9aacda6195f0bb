package graft

import graft.ingest.Sitemap

/** Spec-pins for sitemap parsing: urlset entries, index expansion,
  * XML-five unescape in locs, prolog skipping, truncation/bomb caps. */
class SitemapSpec extends SparkSpec {

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      | <url><loc>https://ex.com/a</loc><lastmod>2024-01-05</lastmod></url>
      | <url><loc> https://ex.com/b?x=1&amp;y=2 </loc></url>
      | <url><lastmod>2024-01-09</lastmod></url>
      | <url><loc>https://ex.com/c</loc><lastmod>2024-02-01</lastmod></url>
      |</urlset>""".stripMargin

  test("urlset: loc+lastmod extraction, trim, unescape, loc-less dropped") {
    val es = Sitemap.parseUrlset(urlset)
    assert(es.map(_.loc) == Seq("https://ex.com/a",
      "https://ex.com/b?x=1&y=2", "https://ex.com/c"))
    assert(es.map(_.lastmod) == Seq("2024-01-05", "", "2024-02-01"))
    assert(!Sitemap.isIndex(urlset))
  }

  test("sitemapindex: child locs; urlset parse of an index is empty") {
    val idx =
      """<?xml version="1.0"?><!-- generated -->
        |<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        | <sitemap><loc>https://ex.com/sitemap-a.xml</loc>
        |   <lastmod>2024-01-01</lastmod></sitemap>
        | <sitemap><loc>https://ex.com/sitemap-b.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    assert(Sitemap.isIndex(idx))
    assert(Sitemap.parseIndex(idx) ==
      Seq("https://ex.com/sitemap-a.xml", "https://ex.com/sitemap-b.xml"))
    assert(Sitemap.parseUrlset(idx).isEmpty)
  }

  test("lastmod from a NEIGHBORING block never leaks into a loc-only url") {
    val x = "<urlset><url><loc>https://e.com/1</loc></url>" +
      "<url><loc>https://e.com/2</loc><lastmod>2024-03-03</lastmod></url></urlset>"
    val es = Sitemap.parseUrlset(x)
    assert(es.map(_.lastmod) == Seq("", "2024-03-03"))
  }

  test("malformed input: truncated block dropped, garbage yields empty") {
    assert(Sitemap.parseUrlset(
      "<urlset><url><loc>https://e.com/ok</loc></url><url><loc>https://e.com/cut")
      .map(_.loc) == Seq("https://e.com/ok"))
    assert(Sitemap.parseUrlset("not xml at all").isEmpty)
    assert(Sitemap.parseUrlset(null).isEmpty)
    assert(!Sitemap.isIndex(null))
    assert(!Sitemap.isIndex("plain text < 1024"))
  }

  test("entry cap bounds the scan (protocol's 50k, never unbounded)") {
    // cap is enforced per call; a doc with more <url> blocks than
    // MaxEntries yields exactly MaxEntries entries. Build a small doc
    // and check the invariant indirectly via parse count == blocks.
    val many = "<urlset>" + (1 to 100).map(i =>
      s"<url><loc>https://e.com/$i</loc></url>").mkString + "</urlset>"
    assert(Sitemap.parseUrlset(many).size == 100)
    assert(Sitemap.MaxEntries == 50000 && Sitemap.MaxBytes == 50 << 20)
  }

  test("index expansion guard: cross-host children are dropped") {
    val parent = "https://www.a.com/sitemap.xml"
    val xml = "<sitemapindex>" +
      "<sitemap><loc>https://www.a.com/sm-1.xml</loc></sitemap>" +
      "<sitemap><loc>HTTPS://WWW.A.COM/sm-2.xml</loc></sitemap>" + // case folds
      "<sitemap><loc>https://evil.example.com/sm.xml</loc></sitemap>" +
      "<sitemap><loc>https://www.a.com:8443/sm.xml</loc></sitemap>" + // port differs
      "<sitemap><loc>http://www.a.com/sm.xml</loc></sitemap>" + // scheme differs
      "<sitemap><loc>/relative/sm.xml</loc></sitemap>" +
      "</sitemapindex>"
    val checked = Sitemap.siteOf(parent) match {
      case Some(site) => Sitemap.parseIndex(xml)
        .filter(c => Sitemap.siteOf(c).contains(site))
      case None => Seq.empty
    }
    assert(checked == Seq("https://www.a.com/sm-1.xml",
      "HTTPS://WWW.A.COM/sm-2.xml"))
    // no-host parent expands nothing
    assert(Sitemap.siteOf("not-a-url").isEmpty)
    assert(Sitemap.siteOf("https://").isEmpty)
  }

  test("index expansion guard: a NESTED index contributes no entries") {
    // the protocol forbids index->index; the one-level contract holds
    // because entries only come from parseUrlset, which returns empty
    // for an index document
    val nested = "<sitemapindex><sitemap>" +
      "<loc>https://a.com/deeper.xml</loc></sitemap></sitemapindex>"
    assert(Sitemap.isIndex(nested))
    assert(Sitemap.parseUrlset(nested).isEmpty)
  }
}
