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
}
