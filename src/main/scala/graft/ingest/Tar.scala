package graft.ingest

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** ustar (POSIX tar) member extraction — the third container family
  * next to WARC records ([[Warc]]) and gzip cells
  * ([[graft.text.GzipText]]): file-per-document corpora ship as tar
  * shards, and the reader shape is the same binaryFile-grain one-pass
  * split. Unlike WARC's text headers, tar is a fixed 512-byte block
  * grid with OCTAL numeric fields and a spaces-as-checksum-field
  * header checksum — the two classic places a hand-rolled reader
  * breaks (off-by-one octal termination, checksum computed over the
  * wrong bytes), both pinned by the q297 round-trip and TarSpec.
  *
  * Writer determinism: mode/uid/gid/mtime are fixed constants so an
  * archive's bytes are a pure function of (name, payload) pairs —
  * the property every round-trip oracle in this repo builds on.
  *
  * Tolerance: a block that is neither a valid header (magic +
  * checksum) nor the end-of-archive marker is skipped — scan resumes
  * at the next 512 boundary, so one corrupt member yields its
  * neighbors, never an exception (the per-cell NULL-dispatch contract
  * at member grain).
  */
object Tar {

  /** Per-member payload budget (64 MiB), the GzipText/Warc bomb cap. */
  val MaxMemberBytes: Long = 1L << 26

  private val Block = 512

  final case class Entry(name: String, payload: Array[Byte])

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits + NUL (the ustar numeric convention)
    val s = java.lang.Long.toOctalString(v)
    val pad = "0" * (width - 1 - s.length) + s
    (pad + "\u0000").getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  }

  /** One ustar member: 512-byte header + payload + zero padding. */
  def writeEntry(name: String, payload: Array[Byte]): Array[Byte] = {
    require(name.getBytes("UTF-8").length <= 100, s"name too long: $name")
    // write/read symmetry: split() rejects members over MaxMemberBytes,
    // so an archive this engine WRITES with a larger payload would
    // silently lose that member at read time — fail loudly here instead
    require(payload.length <= MaxMemberBytes,
      s"member too large: ${payload.length} bytes > $MaxMemberBytes")
    val header = new Array[Byte](Block)
    val nameB = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    System.arraycopy(nameB, 0, header, 0, nameB.length)
    System.arraycopy(octal(420, 8), 0, header, 100, 8)  // mode 0644
    System.arraycopy(octal(0, 8), 0, header, 108, 8)    // uid
    System.arraycopy(octal(0, 8), 0, header, 116, 8)    // gid
    System.arraycopy(octal(payload.length.toLong, 12), 0, header, 124, 12)
    System.arraycopy(octal(0, 12), 0, header, 136, 12)  // mtime
    header(156) = '0'                                   // typeflag: file
    System.arraycopy(Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0'),
      0, header, 257, 8)
    // checksum: header bytes with the chksum field read as spaces
    java.util.Arrays.fill(header, 148, 156, ' '.toByte)
    var sum = 0L
    header.foreach(b => sum += (b & 0xff))
    val ck = java.lang.Long.toOctalString(sum)
    val ckPad = "0" * (6 - ck.length) + ck
    System.arraycopy(ckPad.getBytes("US-ASCII"), 0, header, 148, 6)
    header(154) = 0
    header(155) = ' '
    val padded = (payload.length + Block - 1) / Block * Block
    val out = new Array[Byte](Block + padded)
    System.arraycopy(header, 0, out, 0, Block)
    System.arraycopy(payload, 0, out, Block, payload.length)
    out
  }

  /** Terminate an archive: two zero blocks. */
  def endOfArchive: Array[Byte] = new Array[Byte](2 * Block)

  private def parseOctal(h: Array[Byte], off: Int, len: Int): Option[Long] = {
    var v = 0L
    var i = off
    val end = off + len
    var seen = false
    while (i < end) {
      val c = h(i) & 0xff
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true; i += 1 }
      else if (c == 0 || c == ' ') i = end // terminator
      else return None
    }
    if (seen) Some(v) else None
  }

  private def headerValid(blob: Array[Byte], off: Int): Boolean = {
    // magic "ustar" at 257 and a verifying checksum
    if (blob(off + 257) != 'u' || blob(off + 258) != 's' ||
        blob(off + 259) != 't' || blob(off + 260) != 'a' ||
        blob(off + 261) != 'r') return false
    parseOctal(blob, off + 148, 8) match {
      case None => false
      case Some(stored) =>
        var sum = 0L
        var i = 0
        while (i < Block) {
          val b = if (i >= 148 && i < 156) ' '.toByte else blob(off + i)
          sum += (b & 0xff)
          i += 1
        }
        sum == stored
    }
  }

  private def isZeroBlock(blob: Array[Byte], off: Int): Boolean = {
    var i = off
    while (i < off + Block) { if (blob(i) != 0) return false; i += 1 }
    true
  }

  /** Split an archive blob into members. One pass over the block
    * grid; invalid blocks are skipped (scan realigns at the next 512
    * boundary), end-of-archive stops at the double zero block. */
  def split(blob: Array[Byte]): Seq[Entry] = {
    if (blob == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Entry]
    var pos = 0
    while (pos + Block <= blob.length) {
      if (isZeroBlock(blob, pos)) {
        if (pos + 2 * Block <= blob.length && isZeroBlock(blob, pos + Block))
          return out.toSeq // end-of-archive
        pos += Block
      } else if (!headerValid(blob, pos)) {
        pos += Block // corrupt header: realign, keep scanning
      } else {
        val size = parseOctal(blob, pos + 124, 12).getOrElse(-1L)
        val typeflag = blob(pos + 156)
        if (size < 0 || size > MaxMemberBytes ||
            pos + Block + size > blob.length) { pos += Block }
        else {
          val nameEnd = {
            var e = pos
            while (e < pos + 100 && blob(e) != 0) e += 1
            e
          }
          val name = new String(blob, pos, nameEnd - pos,
            java.nio.charset.StandardCharsets.UTF_8)
          val payload = java.util.Arrays.copyOfRange(
            blob, pos + Block, pos + Block + size.toInt)
          // only regular files ('0' or NUL) become entries; dirs and
          // links still advance the grid by their payload size
          if (typeflag == '0' || typeflag == 0) out += Entry(name, payload)
          pos += Block + ((size.toInt + Block - 1) / Block * Block)
        }
      }
    }
    out.toSeq
  }

  /** `tar_entry(name, payload)` — one serialized member. */
  val entry: UserDefinedFunction =
    udf { (name: String, payload: Array[Byte]) =>
      writeEntry(name,
        if (payload == null) Array.emptyByteArray else payload)
    }

  /** `tar_concat(array<binary>)` — archive from members (caller
    * orders; the end-of-archive marker is appended). */
  val concatEntries: UserDefinedFunction =
    udf { (parts: Seq[Array[Byte]]) =>
      val eoa = endOfArchive
      val total = parts.iterator.map(_.length).sum + eoa.length
      val out = new Array[Byte](total)
      var off = 0
      parts.foreach { p =>
        System.arraycopy(p, 0, out, off, p.length); off += p.length
      }
      System.arraycopy(eoa, 0, out, off, eoa.length)
      out
    }

  /** `tar_split(blob)` — array of (name, payload) structs. */
  val splitUdf: UserDefinedFunction =
    udf { (blob: Array[Byte]) => split(blob).map(e => (e.name, e.payload)) }
}
