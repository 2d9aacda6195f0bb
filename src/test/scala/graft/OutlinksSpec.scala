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
}
