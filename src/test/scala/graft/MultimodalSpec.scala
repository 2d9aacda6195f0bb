package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "alpha bravo charlie delta echo foxtrot"),
    (1L, "golf hotel india"),
    (2L, "juliet kilo lima mike november oscar papa quebec"),
  ).toDF("doc_id", "text")

  test("media table: binary content + typed metadata, type by id") {
    val m = Multimodal.mediaFromDocuments(docs).orderBy("doc_id").collect()
    assert(m.map(_.getAs[String]("media_type")).sameElements(
      Array("image", "audio", "video")))
    assert(m(0).getAs[Array[Byte]]("content").length ==
      "alpha bravo charlie delta echo foxtrot".length)
    assert(m(0).getAs[org.apache.spark.sql.Row]("meta").getInt(0) == 16) // width
  }

  test("feature extraction: deterministic, normalized, null-safe") {
    val m = Multimodal.mediaFromDocuments(docs)
    val f1 = Multimodal.extractFeatures(m).orderBy("doc_id")
      .select("features").as[Seq[Float]].collect()
    val f2 = Multimodal.extractFeatures(m).orderBy("doc_id")
      .select("features").as[Seq[Float]].collect()
    assert(f1.head == f2.head)            // deterministic
    assert(math.abs(f1.head.sum - 1.0) < 1e-5) // L1-normalized histogram
    assert(f1.head.length == 16)
  }

  test("resize caps the larger side and truncates payload") {
    val m = Multimodal.mediaFromDocuments(docs)
    val r = Multimodal.resize(m, 8).orderBy("doc_id").head()
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(math.max(meta.getInt(0), meta.getInt(1)) <= 8)
  }

  test("resize truncates content by the ORIGINAL scale, not the new meta") {
    val m = Multimodal.mediaFromDocuments(docs)
    val before = m.orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Array[Byte]]("content").length,
          r.getAs[org.apache.spark.sql.Row]("meta")))
      .toMap
    Multimodal.resize(m, 8).orderBy("doc_id").collect().foreach { r =>
      val (origLen, origMeta) = before(r.getAs[Long]("doc_id"))
      val scale = math.min(1.0,
        8.0 / math.max(origMeta.getInt(0), origMeta.getInt(1)))
      val expected = math.max(1, (origLen * scale).toInt)
      assert(r.getAs[Array[Byte]]("content").length == expected)
      assert(scale < 1.0) // fixture dims exceed 8, so truncation is real
    }
  }

  test("frame sampling explodes video rows only") {
    val m = Multimodal.mediaFromDocuments(docs)
    val frames = Multimodal.sampleFrames(m, stride = 1, frameBytes = 8)
    assert(frames.select("doc_id").distinct().as[Long].collect()
      .sameElements(Array(2L))) // only the video doc
    assert(frames.count() >= 1)
    assert(frames.agg(max(col("frame_len"))).head().getInt(0) <= 8)
  }

  test("audio chunking: contiguous windows cover the clip, last ragged") {
    val m = Multimodal.mediaFromDocuments(docs)
    val chunks = Multimodal.chunkAudio(m, windowMs = 1000L).collect()
    assert(chunks.nonEmpty)
    val byDoc = chunks.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // starts are contiguous multiples of the window
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i.toLong)
        assert(r.getLong(2) == i * 1000L)
        assert(r.getLong(3) <= 1000L && r.getLong(3) > 0L)
      }
      // every chunk before the last is full-length
      sorted.init.foreach(r => assert(r.getLong(3) == 1000L))
      // reassembling the chunks recovers the full payload length
      val total = sorted.map(_.getInt(5)).sum
      val original = Multimodal.mediaFromDocuments(docs)
        .filter(col("doc_id") === sorted.head.getLong(0))
        .select(length(col("content"))).head().getInt(0)
      assert(total == original, s"chunks=$total original=$original")
    }
  }
}
