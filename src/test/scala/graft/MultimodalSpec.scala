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
    // image rows are REAL P6 payloads whose meta matches the raster dims
    val img = graft.multimodal.PpmCodec
      .decode(m(0).getAs[Array[Byte]]("content")).get
    assert(img.width == 4 && img.height == 4) // doc 0: 0%16+4, 0*7%16+4
    assert(m(0).getAs[org.apache.spark.sql.Row]("meta").getInt(0) == 4)
    // audio rows keep the text bytes as the stand-in payload
    assert(m(1).getAs[Array[Byte]]("content").length ==
      "golf hotel india".length)
    assert(m(1).getAs[org.apache.spark.sql.Row]("meta").getInt(0) == 17) // 1%1024+16
  }

  test("feature extraction: deterministic, normalized, null-safe") {
    val m = Multimodal.mediaFromDocuments(docs)
    val f1 = Multimodal.extractFeatures(m).orderBy("doc_id")
      .select("features").as[Seq[Float]].collect()
    val f2 = Multimodal.extractFeatures(m).orderBy("doc_id")
      .select("features").as[Seq[Float]].collect()
    assert(f1.head == f2.head)            // deterministic
    // doc 0 is an image: [meanR, meanG, meanB, 13-bin luma histogram];
    // the histogram part is L1-normalized, the means sit in [0, 1]
    assert(f1.head.length == 16)
    assert(math.abs(f1.head.drop(3).sum - 1.0) < 1e-5)
    assert(f1.head.take(3).forall(v => v >= 0f && v <= 1f))
    // doc 1 is audio: the stub byte histogram, L1-normalized whole
    assert(math.abs(f1(1).sum - 1.0) < 1e-5)
  }

  test("resize caps the larger side and truncates payload") {
    val m = Multimodal.mediaFromDocuments(docs)
    val r = Multimodal.resize(m, 8).orderBy("doc_id").head()
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(math.max(meta.getInt(0), meta.getInt(1)) <= 8)
  }

  test("resize truncates NON-IMAGE content by the ORIGINAL scale, " +
       "not the new meta") {
    val m = Multimodal.mediaFromDocuments(docs)
      .filter(col("media_type") =!= "image")
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
  test("PpmCodec: hand-built P6 bytes decode byte-exactly; round-trip") {
    import graft.multimodal.PpmCodec
    // 2x1 image: red pixel then blue pixel, built by hand
    val hand = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 0, 0, 0, 0, 255.toByte)
    val img = PpmCodec.decode(hand).get
    assert(img.width == 2 && img.height == 1)
    assert(img.at(0, 0, 0) == 255 && img.at(0, 0, 1) == 0 && img.at(0, 0, 2) == 0)
    assert(img.at(1, 0, 0) == 0 && img.at(1, 0, 2) == 255)
    // canonical re-encode reproduces the hand-built bytes exactly
    assert(PpmCodec.encode(img).sameElements(hand))
    // header grammar: comments and extra whitespace still decode
    val commented = ("P6 # a comment\n  2\t1 # dims\n255\n"
      .getBytes("US-ASCII")) ++ hand.drop(11)
    val img2 = PpmCodec.decode(commented).get
    assert(img2.width == 2 && img2.rgb.sameElements(img.rgb))
    // non-P6 bytes are rejected, not misparsed
    assert(PpmCodec.decode("not an image".getBytes).isEmpty)
    assert(PpmCodec.decode("P6\n2 1\n255\nxx".getBytes).isEmpty) // short raster
  }

  test("PpmCodec: nearest-neighbor resize samples src via integer map") {
    import graft.multimodal.PpmCodec
    // 4x1 gradient: R = 10,20,30,40; resize to 2x1 -> sx = x*4/2 = {0,2}
    val rgb = Array[Byte](10, 0, 0, 20, 0, 0, 30, 0, 0, 40, 0, 0)
    val half = PpmCodec.resizeNearest(PpmCodec.Image(4, 1, rgb), 2, 1)
    assert(half.at(0, 0, 0) == 10 && half.at(1, 0, 0) == 30)
    // upscale 2x1 -> 4x1: sx = x*2/4 = {0,0,1,1}
    val up = PpmCodec.resizeNearest(half, 4, 1)
    assert((0 until 4).map(x => up.at(x, 0, 0)) == Seq(10, 10, 30, 30))
  }

  test("image features come from decoded pixels, not the byte stub") {
    import graft.multimodal.PpmCodec
    // uniform gray 128: meanR=meanG=meanB=128/255, one luma bin holds all
    val n = 6
    val img = PpmCodec.Image(3, 2, Array.fill(n * 3)(128.toByte))
    val f = PpmCodec.features(img)
    assert(math.abs(f(0) - 128.0 / 255.0) < 1e-7)
    assert(f(0) == f(1) && f(1) == f(2))
    assert(f.drop(3).count(_ == 1.0f) == 1 && math.abs(f.drop(3).sum - 1f) < 1e-6)
    // and the Spark stage dispatches to it for P6 payloads
    val df = Seq((0L, "image", PpmCodec.encode(img))).toDF(
      "doc_id", "media_type", "content")
    val got = Multimodal.extractFeatures(df)
      .select("features").as[Seq[Float]].head()
    assert(got == f.toSeq)
  }

}
