package graft.text

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Content-defined chunking (CDC) — storage-grain dedup: split each
  * document at positions where a hash of the trailing w-char window
  * hits a mask, so chunk boundaries are a pure function of LOCAL
  * content. Unlike fixed-size blocks, an insertion early in a document
  * shifts every fixed block but leaves all CDC boundaries after the
  * edit untouched (ChunkerSpec pins exactly that), which is why
  * rsync/LBFS-family systems — and corpus stores that version crawls —
  * dedup at this grain.
  *
  * The boundary hash is the repo's FNV-1a 64 ([[RollingHash]] seed and
  * multiplier) over the window's chars, so the DuckDB oracle replays
  * boundaries bit-exactly with the same `fnvSql` emulation the
  * fingerprint family uses (exact for ASCII corpora — the documented
  * fnvSql contract). The mask test uses the LOW bits (`h & (2^bits-1)
  * == 0`), identical under signed two's-complement and unsigned
  * arithmetic, so neither side needs an unsigned cast.
  *
  * Deliberately NO min/max chunk clamps: clamps make each boundary
  * depend on the previous one (sequential state), destroying both the
  * pure-content property this operator demonstrates and the
  * position-independent SQL replay. Production systems add clamps for
  * size variance; the dedup semantics are unchanged.
  *
  * Cost: O(w) hash per position, one pass per document — corpus-linear
  * with w=8 a small constant. The last position is never a boundary,
  * so no empty trailing chunk exists; with w > text length there are
  * no boundaries and the document is one chunk.
  */
object Chunker {

  private def fnvWindow(text: String, start: Int, w: Int): Long = {
    // chars, not bytes: exact vs SQL's per-codepoint unicode() replay
    // for ASCII; multi-byte text still chunks deterministically
    var h = RollingHash.Seed
    var i = start
    val end = start + w
    while (i < end) {
      h ^= (text.charAt(i) & 0xffffL)
      h *= RollingHash.Mult
      i += 1
    }
    h
  }

  /** 1-based boundary positions: boundary AFTER char i for i in
    * [w, len-1] where fnv(window ending at i) has `bits` low zero
    * bits. Average chunk length ≈ 2^bits chars. */
  def boundaries(text: String, w: Int = 8, bits: Int = 6): Seq[Int] = {
    if (text == null || text.length <= w) return Seq.empty
    val mask = (1L << bits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = w // 1-based window end; exclude the final char (i <= len-1)
    while (i <= text.length - 1) {
      if ((fnvWindow(text, i - w, w) & mask) == 0L) out += i
      i += 1
    }
    out.toSeq
  }

  /** The chunks themselves (concatenation reproduces the input). */
  def chunks(text: String, w: Int = 8, bits: Int = 6): Seq[String] = {
    if (text == null) return Seq.empty
    val bs = boundaries(text, w, bits)
    val starts = 0 +: bs
    val ends = bs :+ text.length
    starts.lazyZip(ends).map { case (s, e) => text.substring(s, e) }
  }

  /** `cdc_chunks(text)` — array of chunk strings. */
  def chunksUdf(w: Int = 8, bits: Int = 6): UserDefinedFunction =
    udf { (text: String) => chunks(text, w, bits) }
}
