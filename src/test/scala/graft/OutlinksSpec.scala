package graft

import graft.extract.Outlinks.hrefs

/** Generic anchor extraction: document order, quote forms, entity
  * decode, duplicate-attribute rule, and the bomb/malformed arms. */
class OutlinksSpec extends SparkSpec {

  test("href forms: double, single, unquoted, attribute order, case") {
    val html = """<p><a href="/a">1</a><a href='/b'>2</a>""" +
      """<a href=/c>3</a><A class=x HREF="/d">4</A>""" +
      """<a data-x="1" href = "/e" rel=nofollow>5</a></p>"""
    assert(hrefs(html) == Seq("/a", "/b", "/c", "/d", "/e"))
  }

  test("entity decode and whitespace trim on the value") {
    assert(hrefs("""<a href="/p?b=2&amp;a=1">x</a>""") == Seq("/p?b=2&a=1"))
    assert(hrefs("""<a href=" /spaced ">x</a>""") == Seq("/spaced"))
    assert(hrefs("""<a href="/tick&#39;s">x</a>""") == Seq("/tick's"))
  }

  test("anchors without an href, or with an empty one, are dropped") {
    assert(hrefs("""<a name="top">t</a><a href="">e</a><a href="  ">w</a>""")
      == Seq.empty)
    // href present on a non-anchor tag is ignored
    assert(hrefs("""<link href="/style.css"><area href="/map">""") == Seq.empty)
  }

  test("first href wins when duplicated; quoted > does not end the tag") {
    assert(hrefs("""<a href="/first" href="/second">x</a>""") == Seq("/first"))
    assert(hrefs("""<a title="a > b" href="/x">y</a>""") == Seq("/x"))
    assert(hrefs("""<a href="/q?gt=>">y</a>""") == Seq("/q?gt=>"))
  }

  test("document order with duplicates preserved; <a> vs <abbr>") {
    val html = """<a href="/x">1</a><abbr href="/no">2</abbr>""" +
      """<article href="/no2"/><a href="/x">3</a>"""
    assert(hrefs(html) == Seq("/x", "/x"))
  }

  test("malformed input never throws; null and truncation are empty") {
    assert(hrefs(null) == Seq.empty)
    assert(hrefs("") == Seq.empty)
    assert(hrefs("<a href=\"/unclosed") == Seq("/unclosed"))
    assert(hrefs("<a") == Seq.empty)
    assert(hrefs("<") == Seq.empty)
    assert(hrefs("plain text & no tags") == Seq.empty)
  }

  test("MaxLinks caps a link farm without throwing") {
    val farm = (0 until 12000).map(i => s"""<a href="/p$i">$i</a>""").mkString
    val out = hrefs(farm)
    assert(out.size == graft.extract.Outlinks.MaxLinks)
    assert(out.head == "/p0" && out.last == "/p9999")
  }

  // ---- anchors: (href, text) pairs ----

  private def anchors(h: String) = graft.extract.Outlinks.anchors(h)

  test("anchor text: nested markup stripped, whitespace collapsed") {
    assert(anchors("""<a href="/x"><b>bold</b>
        |  link</a>""".stripMargin) == Seq(("/x", "bold link")))
  }

  test("anchor text: entities decode AFTER tag strip") {
    assert(anchors("""<a href="/x">skip &amp; go</a>""") ==
      Seq(("/x", "skip & go")))
    // an entity-encoded <b> is TEXT, not markup — it must survive
    assert(anchors("""<a href="/x">&lt;b&gt;literal</a>""") ==
      Seq(("/x", "<b>literal")))
  }

  test("anchor with no visible text yields empty string, href kept") {
    assert(anchors("""<a href="/img"><img src="i.png"/></a>""") ==
      Seq(("/img", "")))
  }

  test("implicit close: a new <a> ends the previous anchor's text") {
    assert(anchors("""<a href="/1">one <a href="/2">two</a>""") ==
      Seq(("/1", "one"), ("/2", "two")))
  }

  test("unclosed trailing anchor collects to end of input") {
    assert(anchors("""<a href="/1">tail text""") ==
      Seq(("/1", "tail text")))
  }

  test("quoted > inside an inner tag does not end the strip") {
    assert(anchors("""<a href="/1">a <span title=">">mid</span> b</a>""") ==
      Seq(("/1", "a mid b")))
  }

  test("anchor-text budget caps a wrapping link farm") {
    val big = "<a href=\"/x\">" + ("y" * 10000) + "</a>"
    val out = anchors(big)
    assert(out.size == 1)
    assert(out.head._2.length == graft.extract.Outlinks.MaxTextChars)
  }

  test("invariant: anchors(h).map(_._1) == hrefs(h) on every fixture") {
    val fixtures = Seq(
      """<a href="/x">3</a><a href='/y'>4</a><a href=/z>5</a>""",
      """<a name="no"></a><a href="">e</a><a href="/k">k</a>""",
      """<a href="/1">one <a href="/2">two</a>""",
      """<a href="/unclosed""",
      "plain text & no tags", "", "<a", "<")
    fixtures.foreach { h =>
      assert(anchors(h).map(_._1) == hrefs(h), s"fixture: $h")
    }
  }
}
