package graft.ingest

import org.apache.spark.sql.functions.udf

/** WARC-style record framing — the container web-scale corpora
  * actually arrive in (Common Crawl WARC/WET members): CRLF header
  * block, `Content-Length`-delimited byte payload, blank-line
  * separators. The reference ingests page HTML one HTTP response at a
  * time (`src/scraper/service.py` fetch loop); a 100 TB replay of the
  * same pipeline reads archived responses from WARC shards instead, so
  * the engine needs the record splitter as a first-class operator.
  *
  * Design for scale: a real deployment reads whole `.warc` files as
  * single binary cells (`spark.read.format("binaryFile")`, one task
  * per ~1 GB member) and flat-maps [[split]] over them — parallelism
  * comes from the file grain, parsing is one linear pass per file, and
  * a malformed record resyncs to the next `WARC/` magic instead of
  * failing the scan (the NULL-dispatch contract at record grain).
  *
  * Payload slicing is BYTE-accurate (Content-Length counts bytes, not
  * chars) — the multi-byte-UTF-8 trap the q180 family's window hasher
  * already taught this repo to test for.
  */
object Warc {

  /** Per-record payload budget: a Content-Length past this is treated
    * as corrupt (resync) rather than allocated — the PngCodec/GzipText
    * bomb-cap precedent. */
  val MaxRecordBytes: Int = 1 << 26

  private val CRLF = "\r\n"
  private val Magic = "WARC/1.0"

  /** One parsed record: numeric id (from `WARC-Record-ID:
    * <urn:graft:N>`; -1 when absent/foreign), target URI ("" when
    * absent), raw payload bytes. */
  final case class Record(id: Long, uri: String, payload: Array[Byte])

  /** Serialize one response record. Header names/order are fixed so
    * round-trip tests are byte-deterministic; Content-Length is the
    * payload's BYTE length. Headers are UTF-8 on the wire (ISO 28500
    * §4: WARC named fields are UTF-8) so a non-ASCII Target-URI
    * round-trips instead of mangling to '?' — the parser decodes with
    * the same charset. */
  def writeRecord(id: Long, uri: String, payload: Array[Byte]): Array[Byte] = {
    val head = new StringBuilder()
      .append(Magic).append(CRLF)
      .append("WARC-Type: response").append(CRLF)
      .append("WARC-Record-ID: <urn:graft:").append(id).append('>').append(CRLF)
      .append("WARC-Target-URI: ").append(uri).append(CRLF)
      .append("Content-Length: ").append(payload.length).append(CRLF)
      .append(CRLF)
      .toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  private val magicBytes =
    Magic.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def matchesAt(blob: Array[Byte], pos: Int): Boolean = {
    if (pos + magicBytes.length > blob.length) return false
    var i = 0
    while (i < magicBytes.length) {
      if (blob(pos + i) != magicBytes(i)) return false
      i += 1
    }
    true
  }

  /** One record plus its byte position in the blob: `offset` is where
    * its `WARC/` magic starts, `length` runs through the trailing
    * CRLFCRLF (when present) — i.e. `blob.slice(offset, offset+length)`
    * re-parses to exactly this record. The member grain a CDX capture
    * index records (see [[graft.ingest.Cdx]]). */
  final case class Indexed(id: Long, uri: String, offset: Long,
                           length: Long, payload: Array[Byte])

  /** [[split]] with byte positions. One linear pass; anything that
    * fails to parse (missing Content-Length, truncated payload,
    * over-budget length, non-numeric length) is skipped by resyncing
    * to the next `WARC/` magic — a corrupt member yields its good
    * records, never an exception. */
  def splitIndexed(blob: Array[Byte]): Seq[Indexed] = {
    if (blob == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Indexed]
    var pos = 0
    while (pos < blob.length) {
      if (!matchesAt(blob, pos)) { pos += 1 }
      else {
        parseOne(blob, pos) match {
          case Some((rec, next)) =>
            out += Indexed(rec.id, rec.uri, pos.toLong, (next - pos).toLong,
              rec.payload)
            pos = next
          case None => pos += 1 // resync past this magic
        }
      }
    }
    out.toSeq
  }

  /** Split a concatenated-record blob into records (the offset-free
    * view of [[splitIndexed]] — same resync contract). */
  def split(blob: Array[Byte]): Seq[Record] =
    splitIndexed(blob).map(m => Record(m.id, m.uri, m.payload))

  /** Parse one record starting at a magic offset; returns the record
    * and the offset just past its trailing blank line. */
  private def parseOne(blob: Array[Byte], start: Int): Option[(Record, Int)] = {
    var pos = start
    var id = -1L
    var uri = ""
    var len = -1L
    // header lines until the empty line
    var done = false
    while (!done) {
      val eol = indexOfCrlf(blob, pos)
      if (eol < 0) return None
      if (eol == pos) { done = true; pos += 2 } // empty line
      else {
        val line = new String(blob, pos, eol - pos,
          java.nio.charset.StandardCharsets.UTF_8)
        pos = eol + 2
        val c = line.indexOf(':')
        if (c > 0) {
          val name = line.substring(0, c).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(c + 1).trim
          name match {
            case "content-length" =>
              try len = value.toLong
              catch { case _: NumberFormatException => return None }
            case "warc-record-id" =>
              val m = "<urn:graft:(\\d+)>".r.findFirstMatchIn(value)
              m.foreach(g => id = g.group(1).toLong)
            case "warc-target-uri" => uri = value
            case _                 => () // tolerated, ignored
          }
        }
      }
    }
    if (len < 0 || len > MaxRecordBytes) return None
    if (pos + len > blob.length) return None // truncated payload
    val payload = java.util.Arrays.copyOfRange(blob, pos, pos + len.toInt)
    var next = pos + len.toInt
    // trailing CRLFCRLF (tolerate a clean EOF right after the payload)
    if (next + 4 <= blob.length &&
        blob(next) == '\r' && blob(next + 1) == '\n' &&
        blob(next + 2) == '\r' && blob(next + 3) == '\n') next += 4
    Some((Record(id, uri, payload), next))
  }

  private def indexOfCrlf(blob: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < blob.length) {
      if (blob(i) == '\r' && blob(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** `warc_record(id, uri, payload)` — one serialized record. */
  val record: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (id: Long, uri: String, payload: Array[Byte]) =>
      writeRecord(id, if (uri == null) "" else uri,
        if (payload == null) Array.emptyByteArray else payload)
    }

  /** `warc_concat(array<binary>)` — a file blob from member records
    * (the aggregate side of the round-trip; order comes from the
    * caller's sort_array, so the blob is deterministic). */
  val concatBlobs: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (parts: Seq[Array[Byte]]) =>
      val total = parts.iterator.map(_.length).sum
      val out = new Array[Byte](total)
      var off = 0
      parts.foreach { p =>
        System.arraycopy(p, 0, out, off, p.length); off += p.length
      }
      out
    }

  /** `warc_split(blob)` — array of (id, uri, payload) structs. */
  val splitUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (blob: Array[Byte]) =>
      split(blob).map(r => (r.id, r.uri, r.payload))
    }
}
