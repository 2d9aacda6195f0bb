package graft

import graft.text.Chunker

class ChunkerSpec extends SparkSpec {

  private val doc = ("key agg row scan slow fast table value part hash " +
    "value table part a row fast merge batch part value fast spark " +
    "a a the line sort table window table table key") * 3

  test("chunks concatenate back to the input, boundaries are interior") {
    val cs = Chunker.chunks(doc)
    assert(cs.mkString == doc)
    assert(cs.forall(_.nonEmpty))
    val bs = Chunker.boundaries(doc)
    assert(bs.forall(b => b >= 8 && b <= doc.length - 1))
    assert(bs == bs.sorted && bs.distinct == bs)
  }

  test("short and null inputs: one chunk / none") {
    assert(Chunker.chunks("tiny") == Seq("tiny"))
    assert(Chunker.chunks("exactly8") == Seq("exactly8")) // len == w
    assert(Chunker.chunks(null) == Seq.empty)
    assert(Chunker.boundaries("tiny") == Seq.empty)
  }

  test("THE CDC property: an insertion preserves all later boundaries") {
    val edited = "Z" + doc
    val cs = Chunker.chunks(doc)
    val csE = Chunker.chunks(edited)
    // every chunk after the FIRST boundary is byte-identical: only the
    // head chunk absorbs the edit (a fixed-block splitter would shift
    // every block after the insertion point)
    val tail = cs.tail
    assert(csE.takeRight(tail.length) == tail)
    // and a mid-document edit preserves both sides beyond the window
    val mid = doc.length / 2
    val edited2 = doc.substring(0, mid) + "INSERTED" + doc.substring(mid)
    val cs2 = Chunker.chunks(edited2)
    // chunks strictly before the edit's chunk are unchanged
    val common = cs.zip(cs2).takeWhile { case (a, b) => a == b }.length
    assert(common > 0, "no shared prefix chunks — boundaries unstable")
    // chunks strictly after the edit's chunk are unchanged
    val commonTail = cs.reverse.zip(cs2.reverse)
      .takeWhile { case (a, b) => a == b }.length
    assert(commonTail > 0, "no shared suffix chunks — boundaries unstable")
    // the disturbed region is local: shared prefix + suffix cover all
    // but a constant number of chunks
    assert(common + commonTail >= cs.length - 3)
  }

  test("average chunk size tracks the mask (2^bits)") {
    val bs = Chunker.boundaries(doc, w = 8, bits = 4) // ~16-char chunks
    val n = doc.length
    assert(bs.size > n / 64 && bs.size < n / 4,
      s"got ${bs.size} boundaries for $n chars")
  }

  test("distributed chunk-grain dedup finds repeated content") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, doc), (2L, doc), (3L, "completely other text " * 20))
      .toDF("doc_id", "text")
    val ch = docs.select(col("doc_id"),
      explode(Chunker.chunksUdf()(col("text"))).as("chunk"))
      .select(col("doc_id"), md5(col("chunk")).as("h"),
        octet_length(col("chunk")).as("nb"))
    val g = ch.groupBy("h").agg(count(lit(1)).as("c"))
    val per = ch.join(g, "h").groupBy("doc_id")
      .agg(sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup"))
      .as[(Long, Long)].collect().toMap
    // docs 1 and 2 are identical: every chunk duplicated
    assert(per(1L) > 0 && per(1L) == per(2L))
  }
}
