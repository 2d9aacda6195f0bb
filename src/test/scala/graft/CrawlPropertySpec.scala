package graft

import graft.ingest.{Tar, Warc}
import graft.text.{Chunker, UrlCanon}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.nio.charset.StandardCharsets.UTF_8

/** Property tests for the crawl-ingestion operators: generated cases
  * under a fixed seed (the PropertySpec convention), each property an
  * algebraic law the oracle gates can't fully cover — idempotence,
  * inversion on arbitrary bytes, concatenation identity, locality. */
class CrawlPropertySpec extends SparkSpec {

  private val N = 300
  private def cases[A](g: Gen[A]): Seq[A] =
    (0 until N).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(97L + i)))

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp")
    host <- Gen.oneOf("Ex.COM", "www.site.org", "a.b.c.io", "H-3.net")
    port <- Gen.oneOf("", ":80", ":443", ":8080", ":1")
    path <- Gen.oneOf("", "/", "/a", "/a/b/", "/a//b", "/x.y/",
      "/%70x", "/a%2fb", "/a%zz%4")
    nq <- Gen.choose(0, 4)
    keys <- Gen.listOfN(nq, Gen.oneOf("a", "b", "zz", "utm_source",
      "utm_x", "fbclid", "ref", "A"))
    frag <- Gen.oneOf("", "#f", "#a?b=1")
  } yield {
    val q = if (keys.isEmpty) ""
      else "?" + keys.zipWithIndex.map { case (k, i) => s"$k=$i" }.mkString("&")
    s"$scheme://$host$port$path$q$frag"
  }

  test("UrlCanon: canonicalize is idempotent on every generated URL") {
    cases(urlGen).foreach { u =>
      val once = UrlCanon.canonicalize(u)
      assert(once.isDefined, u)
      assert(UrlCanon.canonicalize(once.get) == once, u)
    }
  }

  test("UrlCanon: canonical form never carries fragments, tracking params, default ports") {
    cases(urlGen).foreach { u =>
      val c = UrlCanon.canonicalize(u).get
      assert(!c.contains("#"), c)
      assert(!c.contains("utm_") && !c.contains("fbclid") &&
        !c.contains("ref="), c)
      assert(!(c.startsWith("http://") && c.contains(":80/")) &&
        !(c.startsWith("https://") && c.contains(":443/")), c)
      // scheme and host are lowercase
      val hostEnd = c.indexWhere(ch => ch == '/' || ch == '?',
        c.indexOf("://") + 3) match { case -1 => c.length; case i => i }
      assert(c.substring(0, hostEnd) ==
        c.substring(0, hostEnd).toLowerCase(java.util.Locale.ROOT), c)
    }
  }

  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 2000)
    bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs.toArray

  test("Warc: split(concat(records)) inverts on arbitrary binary payloads") {
    val recsGen = for {
      k <- Gen.choose(1, 5)
      ps <- Gen.listOfN(k, bytesGen)
    } yield ps
    cases(recsGen).foreach { ps =>
      val blob = ps.zipWithIndex
        .map { case (p, i) => Warc.writeRecord(i.toLong, s"u$i", p) }
        .foldLeft(Array.emptyByteArray)(_ ++ _)
      val got = Warc.split(blob)
      assert(got.size == ps.size)
      got.zip(ps).foreach { case (r, p) =>
        assert(java.util.Arrays.equals(r.payload, p))
      }
    }
  }

  test("Tar: split(archive(entries)) inverts on arbitrary binary payloads") {
    val recsGen = for {
      k <- Gen.choose(1, 4)
      ps <- Gen.listOfN(k, bytesGen)
    } yield ps
    cases(recsGen).foreach { ps =>
      val blob = ps.zipWithIndex
        .map { case (p, i) => Tar.writeEntry(s"e$i", p) }
        .foldLeft(Array.emptyByteArray)(_ ++ _) ++ Tar.endOfArchive
      val got = Tar.split(blob)
      assert(got.size == ps.size, s"sizes: got ${got.size} want ${ps.size}")
      got.zip(ps).foreach { case (e, p) =>
        assert(java.util.Arrays.equals(e.payload, p))
      }
    }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 400)
    cs <- Gen.listOfN(n, Gen.frequency(
      (20, Gen.alphaNumChar), (5, Gen.const(' ')),
      (1, Gen.oneOf('é', 'π', ' '))))
  } yield cs.mkString

  test("Chunker: chunks concatenate to the input; boundaries stable under prefix edits") {
    cases(textGen).foreach { t =>
      val cs = Chunker.chunks(t)
      assert(cs.mkString == t)
      val edited = "EDIT " + t
      val csE = Chunker.chunks(edited)
      assert(csE.mkString == edited)
      // locality: all chunks after the first boundary of t survive
      if (cs.length > 1) {
        val tail = cs.tail
        assert(csE.takeRight(tail.length) == tail, t.take(60))
      }
    }
  }
}
