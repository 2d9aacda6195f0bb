package graft

import graft.text.BpeTrainer

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic merge sequence on a hand-checkable corpus") {
    // vocab: ababc x4, abd x2  → pair counts: (a,b) 4*2+2=10 wins first.
    // after merge1 "ab": ababc → [ab, ab, c], abd → [ab, d]
    //   pairs: (ab,ab)=4, (ab,c)=4, (ab,d)=2 → tie (ab,ab) < (ab,c) lex
    val docs = Seq(
      (1L, "ababc ababc abd"),
      (2L, "ababc ababc abd"),
    ).toDF("id", "text")
    val merges = BpeTrainer.train(docs, "text", 3)
    assert(merges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("ab", "ab"), ("abab", "c")))
    assert(merges.head.freq == 10)
    assert(merges(1).freq == 4)
  }

  test("applyMerges replays greedily in rank order") {
    val ms = Seq(("a", "b"), ("ab", "ab"))
    assert(BpeTrainer.applyMerges("ababab", ms).toSeq ==
      Seq("abab", "ab"))
    assert(BpeTrainer.applyMerges("xyz", ms).toSeq == Seq("x", "y", "z"))
    assert(BpeTrainer.applyMerges("", ms).isEmpty)
  }

  test("tokenize: concatenated tokens reconstruct each word; merges compress") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(100)
    val merges = BpeTrainer.train(docs, "text", 10)
    assert(merges.size == 10)
    val toks = BpeTrainer.tokenize(docs, "text", merges)
      .select($"text", $"tokens").collect()
    toks.foreach { r =>
      val words = r.getString(0).trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty)
      assert(r.getSeq[String](1).mkString("") == words.mkString(""))
    }
    // merging strictly reduces symbol count vs character segmentation
    val nChars = toks.map(_.getString(0).replaceAll("\\s+", "").length).sum
    val nToks = toks.map(_.getSeq[String](1).length).sum
    assert(nToks < nChars)
    // merge frequencies are positive and ranks sequential
    assert(merges.map(_.rank) == (1 to 10))
    assert(merges.forall(_.freq > 0))
  }
}
