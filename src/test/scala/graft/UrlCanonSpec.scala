package graft

import graft.text.UrlCanon

class UrlCanonSpec extends SparkSpec {

  private def c(u: String): Option[String] = UrlCanon.canonicalize(u)

  test("scheme and host lowercase, userinfo dropped") {
    assert(c("HTTP://User:Pw@WWW.Ex.COM/a") == Some("http://www.ex.com/a"))
  }

  test("default ports stripped, explicit ports kept") {
    assert(c("http://h.com:80/x") == Some("http://h.com/x"))
    assert(c("https://h.com:443/x") == Some("https://h.com/x"))
    assert(c("http://h.com:8080/x") == Some("http://h.com:8080/x"))
    assert(c("https://h.com:80/x") == Some("https://h.com:80/x"))
  }

  test("fragment dropped, empty path becomes /, trailing slash stripped") {
    assert(c("http://h.com#frag") == Some("http://h.com/"))
    assert(c("http://h.com/") == Some("http://h.com/"))
    assert(c("http://h.com/a/b/") == Some("http://h.com/a/b"))
    assert(c("http://h.com/a/b/?x=1#f") == Some("http://h.com/a/b?x=1"))
  }

  test("tracking params removed, remainder sorted, empty query dropped") {
    assert(c("http://h.com/p?utm_source=a&b=2&a=1&utm_campaign=c") ==
      Some("http://h.com/p?a=1&b=2"))
    assert(c("http://h.com/p?UTM_Source=a&FBCLID=x&gclid=y") ==
      Some("http://h.com/p"))
    assert(c("http://h.com/p?b=2&&a=1&") == Some("http://h.com/p?a=1&b=2"))
    // valueless and repeated params keep a deterministic sorted form
    assert(c("http://h.com/p?z&a=2&a=10") == Some("http://h.com/p?a=10&a=2&z"))
  }

  test("safe percent-decoding: unreserved decodes, reserved uppercases, junk passes") {
    assert(c("http://h.com/%70ath/%41") == Some("http://h.com/path/A"))
    assert(c("http://h.com/a%2fb") == Some("http://h.com/a%2Fb")) // '/' stays encoded
    assert(c("http://h.com/a%zz%4") == Some("http://h.com/a%zz%4")) // malformed untouched
    assert(c("http://h.com/p?x=%7Evalue&a=%31") ==
      Some("http://h.com/p?a=1&x=~value"))
    // an encoded tracking-param name cannot sneak past the filter
    assert(c("http://h.com/p?ut%6D_source=x&a=1") == Some("http://h.com/p?a=1"))
  }

  test("idempotent: canonicalize(canonicalize(u)) == canonicalize(u)") {
    val us = Seq(
      "HTTP://A.B:80/x/?b=2&a=1#f",
      "https://h.io/p?utm_source=s",
      "http://h.com",
      "http://u@h.com:9090/a//b/?q=1")
    us.foreach { u =>
      val once = c(u).get
      assert(c(once) == Some(once), s"not idempotent for $u")
    }
  }

  test("NULL dispatch: unparseable cells give None, never throw") {
    assert(c(null).isEmpty)
    assert(c("").isEmpty)
    assert(c("not a url").isEmpty)
    assert(c("://nohost/x").isEmpty)
    assert(c("http://").isEmpty)
    assert(c("http://h.com:notaport/x").isEmpty)
    assert(c("ht tp://h.com/").isEmpty)
  }

  test("registered domain: longest suffix wins, bare suffix is None") {
    val sfx = Set("com", "uk", "co.uk", "io", "github.io")
    def rd(h: String) = UrlCanon.registeredDomain(h, sfx)
    assert(rd("www.site.co.uk") == Some("site.co.uk"))
    assert(rd("site.co.uk") == Some("site.co.uk"))
    assert(rd("cdn.a.site.github.io") == Some("site.github.io"))
    assert(rd("x.com") == Some("x.com"))
    // bare suffixes and unmatched hosts
    assert(rd("co.uk").isEmpty)
    assert(rd("com").isEmpty)
    assert(rd("host.internal").isEmpty)
    assert(rd("").isEmpty)
    assert(rd("a..b.com").isEmpty)
  }

  test("column form: canon over a DataFrame, NULL for bad rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq(
        (1L, "HTTP://H.com:80/a/?b=2&a=1#f"),
        (2L, "garbage"),
      ).toDF("id", "u")
      .select(col("id"), UrlCanon.canon(col("u")).as("c"))
      .orderBy("id").as[(Long, Option[String])].collect()
    assert(got(0) == ((1L, Some("http://h.com/a?a=1&b=2"))))
    assert(got(1) == ((2L, None)))
  }
}
