package graft

import graft.text.HtmlEntities.decode

/** Spec-pins for HTML character-reference decoding: the numeric,
  * named and legacy-bare arms, plus the HTML5 C1-remap and
  * malformed-passthrough rules the q300 oracle replays. */
class HtmlEntitiesSpec extends SparkSpec {

  test("the XML five, named and numeric forms agree") {
    assert(decode("Tom &amp; Jerry") == "Tom & Jerry")
    assert(decode("Tom &#38; Jerry") == "Tom & Jerry")
    assert(decode("Tom &#x26; Jerry") == "Tom & Jerry")
    assert(decode("&lt;b&gt;&quot;x&quot;&apos;") == "<b>\"x\"'")
    assert(decode("a &eacute; b") == "a é b")
    assert(decode("&euro;5 &mdash; &hellip;") == "€5 — …")
  }

  test("numeric refs: hex case-insensitive, leading zeros, astral") {
    assert(decode("&#X26;") == "&")
    assert(decode("&#038;") == "&")
    assert(decode("&#x1F600;") == new String(Character.toChars(0x1F600)))
  }

  test("HTML5 C1 remap: &#147; is a curly quote, not a control char") {
    assert(decode("&#147;q&#148;") == "“q”")
    assert(decode("&#x93;") == "“")
    assert(decode("&#128;") == "€") // euro at 0x80
    // the five cp1252 holes stay C1 controls
    assert(decode("&#129;") == "\u0081")
  }

  test("NUL, surrogates, out-of-range become U+FFFD") {
    assert(decode("&#0;") == "�")
    assert(decode("&#xD800;") == "�")
    assert(decode("&#x110000;") == "�")
    assert(decode("&#99999999999;") == "�")
  }

  test("malformed references pass through verbatim") {
    for (s <- Seq("&", "&;", "&#;", "&#x;", "&#xZZ;", "&unknown;",
      "fish & chips", "&#38", "&eacute", "100 &x 200"))
      assert(decode(s) == s, s)
    // case-sensitive: &Amp; is not a reference (but &Ouml; is)
    assert(decode("&Amp;") == "&Amp;")
    assert(decode("&Ouml;") == "Ö")
  }

  test("legacy bare names decode without semicolon, with the extend guard") {
    assert(decode("fish &amp chips") == "fish & chips")
    assert(decode("a &lt b &gt c") == "a < b > c")
    assert(decode("&amp") == "&")         // end of string
    assert(decode("&ampx") == "&ampx")    // name scan is maximal: not a ref
    assert(decode("&amp=1") == "&amp=1")  // attribute-value guard
    assert(decode("&copy 2024") == "© 2024")
    // non-legacy names NEED the semicolon
    assert(decode("&euro 5") == "&euro 5")
  }

  test("entity-variant duplicates collapse to one decoded form") {
    val variants = Seq("café & bar — “open”",
      "caf&eacute; &amp; bar &mdash; &ldquo;open&rdquo;",
      "caf&#233; &#38; bar &#8212; &#x201C;open&#x201D;",
      "caf&#xE9; &amp bar &#8212; &#147;open&#148;")
    assert(variants.map(decode).distinct.size == 1)
  }
}
