package graft

import graft.ingest.{Cdx, Warc}
import java.nio.charset.StandardCharsets.UTF_8

class CdxSpec extends SparkSpec {

  private def rec(id: Long, uri: String, body: String): Array[Byte] =
    Warc.writeRecord(id, uri, body.getBytes(UTF_8))

  // ---- SURT keys ----

  test("surt collapses scheme/case/www/default-port/query-order spellings") {
    val k = Cdx.surt("https://WWW.Example.com:443/A/B?b=2&a=1")
    assert(k == "com,example)/a/b?a=1&b=2")
    assert(Cdx.surt("http://example.com/a/b?a=1&b=2") == k)
    assert(Cdx.surt("//example.com/a/b?a=1&b=2") == k)
  }

  test("surt keeps non-default ports and scheme-mismatched defaults") {
    assert(Cdx.surt("http://example.com:8080/x") ==
      "com,example:8080)/x")
    // 443 is NOT the default for http — it must survive
    assert(Cdx.surt("http://example.com:443/x") ==
      "com,example:443)/x")
  }

  test("surt drops fragment and userinfo; empty path becomes /") {
    assert(Cdx.surt("https://user:pw@example.com#frag") ==
      "com,example)/")
    assert(Cdx.surt("https://example.com?z=1&a=2#f") ==
      "com,example)/?a=2&z=1")
  }

  test("surt strips exactly one leading www label") {
    assert(Cdx.surt("http://www.www.example.com/") ==
      "com,example,www)/")
    // a host that IS just www keeps itself (stripping would empty it)
    assert(Cdx.surt("http://www/") == "www)/")
  }

  test("surt does not reverse IP-literal hosts") {
    assert(Cdx.surt("http://10.0.0.1/x") == "10.0.0.1)/x")
    assert(Cdx.surt("http://[2001:db8::1]:8080/x") ==
      "[2001:db8::1]:8080)/x")
    assert(Cdx.surt("http://[2001:db8::1]/x") == "[2001:db8::1])/x")
  }

  test("surt quarantine key for null/empty/hostless input") {
    assert(Cdx.surt(null) == "")
    assert(Cdx.surt("") == "")
    assert(Cdx.surt("   ") == "")
    assert(Cdx.surt("http:///path-no-host") == "")
  }

  test("surt drops empty query params; a bare ? keys as no query") {
    assert(Cdx.surt("http://example.com/p?") == "com,example)/p")
    assert(Cdx.surt("http://example.com/p?&&") == "com,example)/p")
  }

  // ---- index ----

  test("index records byte-exact offsets, lengths and digests") {
    val blob = rec(0L, "http://a/0", "alpha") ++
      rec(1L, "http://a/1", "beta") ++ rec(2L, "http://b/2", "gamma")
    val idx = Cdx.index(blob)
    assert(idx.map(_.id) == Seq(0L, 1L, 2L))
    assert(idx.head.offset == 0L)
    // offsets are the running sum of lengths; the extents tile the blob
    assert(idx(1).offset == idx(0).length)
    assert(idx(2).offset == idx(0).length + idx(1).length)
    assert(idx.map(_.length).sum == blob.length)
    // digest = md5 hex of the payload bytes
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("alpha".getBytes(UTF_8))
      .map(b => f"$b%02x").mkString
    assert(idx.head.digest == want)
    assert(idx.head.urlkey == "a)/0")
  }

  test("a corrupt member is absent from the index; neighbors keep extents") {
    val good = rec(1L, "http://a/1", "one")
    val bad = "WARC/1.0\r\nContent-Length: notanumber\r\n\r\n"
      .getBytes(UTF_8)
    val tail = rec(2L, "http://a/2", "two")
    val idx = Cdx.index(good ++ bad ++ tail)
    assert(idx.map(_.id) == Seq(1L, 2L))
    // the tail member's recorded offset is its TRUE position (past the
    // corrupt bytes), so fetch still lands on it
    assert(idx(1).offset == (good.length + bad.length).toLong)
  }

  // ---- fetch (the read path) ----

  test("fetch parses exactly the indexed slice — equal to full-scan member") {
    val blob = rec(10L, "http://a/x", "payload A") ++
      rec(11L, "http://a/y", "payload B") ++
      rec(12L, "http://a/z", "payload C")
    val full = Warc.split(blob)
    Cdx.index(blob).zip(full).foreach { case (e, want) =>
      val got = Cdx.fetch(blob, e.offset, e.length)
      assert(got.isDefined)
      assert(got.get.id == want.id)
      assert(got.get.uri == want.uri)
      assert(java.util.Arrays.equals(got.get.payload, want.payload))
    }
  }

  test("fetch quarantines stale extents instead of misframing") {
    val blob = rec(1L, "http://a/1", "one") ++ rec(2L, "http://a/2", "two")
    val idx = Cdx.index(blob)
    // out of bounds
    assert(Cdx.fetch(blob, blob.length.toLong, 10L).isEmpty)
    assert(Cdx.fetch(blob, -1L, 10L).isEmpty)
    assert(Cdx.fetch(blob, 0L, 0L).isEmpty)
    // an extent spanning TWO members is stale, not "the first one"
    assert(Cdx.fetch(blob, 0L, idx(0).length + idx(1).length).isEmpty)
    // an extent cut short of the member's payload fails to parse
    assert(Cdx.fetch(blob, idx(0).offset, idx(0).length - 10L).isEmpty)
  }

  test("splitIndexed slice re-parses to the same record (framing invariant)") {
    // non-ASCII uri + payload: offsets count BYTES, not chars
    val blob = rec(5L, "http://exämple.com/ü", "café 𝄞") ++
      rec(6L, "http://a/b", "plain")
    Warc.splitIndexed(blob).foreach { m =>
      val slice = java.util.Arrays.copyOfRange(
        blob, m.offset.toInt, (m.offset + m.length).toInt)
      val again = Warc.split(slice)
      assert(again.size == 1)
      assert(again.head.id == m.id)
      assert(again.head.uri == m.uri)
      assert(java.util.Arrays.equals(again.head.payload, m.payload))
    }
  }
}
