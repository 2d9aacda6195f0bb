package graft

import graft.sketch.{BloomBits, BloomPrune}
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; false-positive rate near theory") {
    val b = new BloomBits(1 << 16, 5)
    (1L to 2000L).foreach(b.add)
    assert((1L to 2000L).forall(b.mightContain))
    val fps = (100000L to 120000L).count(b.mightContain)
    // m/n = 32.8 bits/key, k=5 -> theoretical fp ~ 0.1%; allow 10x slack
    assert(fps < 200, s"false positives: $fps / 20000")
  }

  test("distributed bloom_agg equals a locally-built filter") {
    val keys = (1L to 5000L).map(k => k * 7)
    val bytes = keys.toDF("k").repartition(7)
      .agg(BloomPrune.bloom_agg(col("k"), 1 << 16, 5))
      .head().getAs[Array[Byte]](0)
    val dist = BloomBits.deserialize(bytes)
    val local = new BloomBits(1 << 16, 5)
    keys.foreach(local.add)
    assert(dist.words.toSeq == local.words.toSeq) // OR-merge is exact
  }

  test("bloom semi-join equals plain semi-join; pre-filter prunes") {
    val big = (1L to 50000L).map(i => (i, s"row$i")).toDF("k", "v")
    val small = (1L to 500L).map(i => (i * 100, s"dim$i")).toDF("k", "d")
    val plain = big.join(small.select("k").distinct(), Seq("k"), "left_semi")
    val bloom = BloomPrune.semiJoin(big, small, "k")
    assert(bloom.count() == plain.count())
    assert(bloom.except(plain).count() == 0 && plain.except(bloom).count() == 0)
    // the map-side pre-filter alone keeps all matches and prunes most rest
    val bytes = small.agg(BloomPrune.bloom_agg(col("k")))
      .head().getAs[Array[Byte]](0)
    val prunedCount = BloomPrune.prune(big, "k", bytes).count()
    assert(prunedCount >= 500 && prunedCount < 2000,
      s"pruned to $prunedCount of 50000")
  }

  test("bloom anti-join equals plain anti-join (FPs cannot leak, FNs impossible)") {
    // batch deliberately overlaps the corpus on every 10th key; an
    // undersized filter (m/n ~ 3.3 bits) forces a HIGH fp rate so the
    // exact-join backstop is actually exercised, not just compiled
    val corpus = (1L to 5000L).map(i => i * 10).toDF("k")
    val batch = (1L to 10000L).map(i => (i, s"doc$i")).toDF("k", "v")
    val plain = batch.join(corpus.select("k").distinct(), Seq("k"), "left_anti")
    val bloom = BloomPrune.antiJoin(batch, corpus, "k",
      numBits = 1 << 14, numHashes = 3)
    assert(bloom.count() == plain.count())
    assert(bloom.except(plain).count() == 0 && plain.except(bloom).count() == 0)
    // and with the production-sized filter the maybe-seen fraction that
    // pays the shuffle is small: dup rate 10% + fp margin under 2%
    val bytes = corpus.agg(BloomPrune.bloom_agg(col("k")))
      .head().getAs[Array[Byte]](0)
    val maybe = BloomPrune.prune(batch, "k", bytes).count()
    assert(maybe >= 1000 && maybe < 1200, s"maybe-seen: $maybe of 10000")
  }

  test("anti-join keeps NULL-key batch rows (left_anti semantics)") {
    // NULL never equals any corpus key, so a true left_anti keeps
    // NULL-key left rows — the bloom fast path must agree
    val corpus = (1L to 100L).map(i => i * 10).toDF("k")
    val batch = Seq((Option(5L), "new"), (Option(10L), "dup"),
      (Option.empty[Long], "null1"), (Option.empty[Long], "null2"))
      .toDF("k", "v")
    val plain = batch.join(corpus.select("k").distinct(), Seq("k"), "left_anti")
    val bloom = BloomPrune.antiJoin(batch, corpus, "k")
    val got = bloom.select("v").as[String].collect().sorted.toSeq
    assert(got == Seq("new", "null1", "null2"))
    assert(bloom.except(plain).count() == 0 && plain.except(bloom).count() == 0)
  }
}
