package graft

import graft.text.UrlResolve
import graft.text.UrlResolve.resolve

/** RFC 3986 resolution pinned against the RFC's OWN test table
  * (§5.4.1 normal and §5.4.2 abnormal examples, base
  * http://a/b/c/d;p?q), plus the crawl-shaped cases the q308 card
  * relies on and adversarial dot-segment properties. */
class UrlResolveSpec extends SparkSpec {

  private val Base = "http://a/b/c/d;p?q"

  test("RFC 3986 section 5.4.1 normal examples") {
    val vectors = Seq(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    vectors.foreach { case (ref, want) =>
      assert(resolve(Base, ref).contains(want), s"ref '$ref'")
    }
  }

  test("RFC 3986 section 5.4.2 abnormal examples") {
    val vectors = Seq(
      // .. past root is swallowed, never escapes
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      // . / .. only special as COMPLETE segments
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      // nonsensical dot forms
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      // query/fragment are never path
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      // strict parser: same-scheme ref stays absolute
      "http:g" -> "http:g")
    vectors.foreach { case (ref, want) =>
      assert(resolve(Base, ref).contains(want), s"ref '$ref'")
    }
  }

  test("crawl-shaped cases: scheme-relative, root, deep bases") {
    assert(resolve("http://h.example.com/a/b/page.html", "c/d.html")
      .contains("http://h.example.com/a/b/c/d.html"))
    assert(resolve("http://h.example.com/a/b/page.html", "//cdn.example.com/x.js")
      .contains("http://cdn.example.com/x.js"))
    assert(resolve("https://h.example.com/a/", "//cdn.example.com/x")
      .contains("https://cdn.example.com/x")) // base scheme carries
    assert(resolve("http://h.example.com", "g")
      .contains("http://h.example.com/g")) // empty base path merges at root
    assert(resolve("http://h.example.com/p?old=1", "?new=2")
      .contains("http://h.example.com/p?new=2"))
    assert(resolve("http://h.example.com/p", "HTTPS://Abs.example.com/y#f")
      .contains("HTTPS://Abs.example.com/y#f")) // case kept: canon's job
  }

  test("NULL-dispatch: relative or null base, null ref") {
    assert(resolve("not a url", "g").isEmpty)
    assert(resolve("/rooted/only", "g").isEmpty)
    assert(resolve("mailto:x@y", "g").isEmpty) // no authority
    assert(resolve(null, "g").isEmpty)
    assert(resolve(Base, null).isEmpty)
  }

  test("adversarial dot segments never escape the root") {
    // long alternating runs: the output path must never contain a
    // . or .. segment and never climb above /
    val refs = Seq(
      "a/" + ("../" * 40) + "g",
      ("../" * 64) + "g",
      "/" + ("./" * 50) + "g",
      "a/b/" + ("./.." * 30) + "/g")
    refs.foreach { ref =>
      val r = resolve("http://h/x/y/", ref).get
      val path = r.stripPrefix("http://h")
      assert(path.startsWith("/"), ref)
      assert(!path.split("/").contains(".."), s"$ref -> $r")
      assert(!path.split("/").contains("."), s"$ref -> $r")
    }
    // and the canonical pathological self-product stays linear: a
    // 100k-char run completes instantly (O(n) buffer algorithm)
    val big = "../" * 30000 + "g"
    assert(resolve("http://h/a/b/", big).contains("http://h/g"))
  }

  test("removeDotSegments exactly matches the RFC buffer semantics") {
    import UrlResolve.removeDotSegments
    assert(removeDotSegments("/a/b/c/./../../g") == "/a/g")
    assert(removeDotSegments("mid/content=5/../6") == "mid/6")
    assert(removeDotSegments("/a//b/../c") == "/a//c") // // is a real (empty) segment
    assert(removeDotSegments("/..") == "/")
    assert(removeDotSegments("/.") == "/")
    assert(removeDotSegments("..") == "")
    assert(removeDotSegments(".") == "")
    assert(removeDotSegments("") == "")
  }
}
