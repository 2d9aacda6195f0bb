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

  test("property: full merge sequence equals an independent in-memory model") {
    // naive reference BPE: count adjacent pairs over (word, freq),
    // argmax (freq desc, pair lex asc), merge, repeat
    def refBpe(vocab: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
      var segs: Map[Seq[String], Long] =
        vocab.map { case (w, f) => (w.map(_.toString): Seq[String]) -> f }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      for (_ <- 1 to n) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        segs.foreach { case (s, f) =>
          s.sliding(2).filter(_.size == 2).foreach { p =>
            counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
          }
        }
        if (counts.isEmpty) return out.toSeq
        val ((l, r), f) = counts.toSeq
          .sortBy { case ((l, r), f) => (-f, l, r) }.head
        out += ((l, r, f))
        segs = segs.toSeq.map { case (s, wf) =>
          val m = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              m += l + r; i += 2
            } else { m += s(i); i += 1 }
          }
          (m.toSeq, wf)
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
      out.toSeq
    }

    val rng = new scala.util.Random(53)
    for (trial <- 0 until 3) {
      val words = (0 until 40).map { _ =>
        (0 until (2 + rng.nextInt(6))).map(_ => ('a' + rng.nextInt(3)).toChar)
          .mkString
      }
      val docs = (0 until 60).map { i =>
        (i.toLong, (0 until (3 + rng.nextInt(8)))
          .map(_ => words(rng.nextInt(words.length))).mkString(" "))
      }.toDF("id", "text")
      val got = BpeTrainer.train(docs, "text", 8)
        .map(m => (m.left, m.right, m.freq))
      val vocab = docs.collect().flatMap(_.getString(1).split(" "))
        .groupBy(identity).map { case (w, a) => w -> a.length.toLong }
      val want = refBpe(vocab, 8)
      assert(got == want, s"trial $trial: engine=$got ref=$want")
    }
  }

  test("applyMerges segments by codepoint: non-BMP chars stay whole") {
    // U+1F600 is two UTF-16 code units; a code-unit split would leave
    // unpaired surrogate halves that no merge list could ever name,
    // and would diverge from the codepoint-based DuckDB oracle
    val emoji = new String(Character.toChars(0x1F600))
    val word = s"a${emoji}b"
    val syms = BpeTrainer.applyMerges(word, Nil)
    assert(syms.toSeq == Seq("a", emoji, "b"))
    // and the merged symbol round-trips through a merge touching it
    val merged = BpeTrainer.applyMerges(word, Seq(("a", emoji)))
    assert(merged.toSeq == Seq("a" + emoji, "b"))
  }

  test("byte grain: trainBytes == train on an already-lowercase ASCII " +
      "corpus (byte == codepoint there), and merges replay") {
    val docs = Seq(
      (1L, "ababc ababc abd"),
      (2L, "ababc ababc abd"),
    ).toDF("id", "text")
    val byteMerges = BpeTrainer.trainBytes(docs, "text", 3)
    assert(byteMerges.map(m => (m.left, m.right)) ==
      Seq(("a", "b"), ("ab", "ab"), ("abab", "c")))
    assert(BpeTrainer.applyMergesBytes("ababcabd",
      byteMerges.map(m => (m.left, m.right))).toSeq ==
      Seq("ababc", "ab", "d"))
  }

  test("byte grain: every byte is in-alphabet — NUL, controls, SHY, " +
      "NBSP, non-BMP emoji all segment and round-trip byte-for-byte") {
    import org.apache.spark.sql.functions._
    val emoji = new String(Character.toChars(0x1F600)) // 4 UTF-8 bytes
    val nasty = Seq(
      (1L, "a\u0000b nul\u0000embedded"),            // NUL inside a word
      (2L, "soft\u00ADhyphen and\u00A0nbsp stay"), // bytes 173/160 class
      (3L, s"mixed ${emoji}CASE Präzision 中文"), // 2/3/4-byte UTF-8
      (4L, "  \t tabs\u000Band\ffeeds \r\n  "),  // ASCII \s collapses
      (5L, "the marker ␟ itself is data"),      // Eow char as INPUT
      (6L, "plain ascii words survive too"))
      .toDF("doc_id", "text")
    val merges = BpeTrainer.trainBytes(nasty, "text", 8)
    val got = BpeTrainer.tokenizeBytesEow(nasty, "text", merges)
      .select(col("doc_id"), col("tokens"),
        BpeTrainer.detokenizeBytes(col("tokens")).as("detok"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getString(2))).toMap
    nasty.collect().foreach { r =>
      val id = r.getLong(0)
      // byte-level contract: case preserved, every non-ASCII-whitespace
      // byte preserved; ONLY the \s+ word split normalizes
      // mirror the engine exactly: Spark SQL trim strips ONLY spaces
      // (Java's trim would also strip edge control chars); the \s+
      // split plus nonEmpty filter is what actually normalizes
      val norm = r.getString(1).split("\\s+").filter(_.nonEmpty)
      assert(got(id)._2 == norm.mkString(" "), s"doc $id detok mismatch")
      assert(got(id)._1.count(_.endsWith(BpeTrainer.Eow)) == norm.length,
        s"doc $id marker count")
    }
    // the raw Eow char can never appear INSIDE a byte-level piece body:
    // its UTF-8 bytes ride bijection chars, so markers stay unambiguous
    // even when the input text contains the marker codepoint itself
    assert(got(5L)._1.forall(p => !p.dropRight(1).contains(BpeTrainer.Eow)))
  }

  test("property: byte-level detok ∘ tokenizeBytesEow == whitespace-" +
      "normalized identity on random byte-dense strings") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(97)
    val alphabet: IndexedSeq[String] =
      (0 until 256).map(b => new String(Array(b.toByte), "ISO-8859-1")) ++
        Seq(new String(Character.toChars(0x1F600)), "中", "␟", "é")
    val docs = (0 until 50).map { i =>
      (i.toLong, (0 until (1 + rng.nextInt(30)))
        .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    val merges = BpeTrainer.trainBytes(docs, "text", 5)
    val got = BpeTrainer.tokenizeBytesEow(docs, "text", merges)
      .select(col("doc_id"),
        BpeTrainer.detokenizeBytes(col("tokens")).as("detok"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.collect().foreach { r =>
      val want = r.getString(1).split("\\s+").filter(_.nonEmpty)
        .mkString(" ")
      assert(got(r.getLong(0)) == want,
        s"doc ${r.getLong(0)}: ${got(r.getLong(0))} != $want")
    }
  }

  test("tokenizeEow + detokenize: lossless inversion to normalized " +
      "text; piece counts equal plain tokenize") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "the quick  brown   fox the the quick"),
      (2L, "  MiXeD Case   WHITESPACE  "),
      (3L, "single"),
      (4L, "aa aa aa bb aabb aab"))
      .toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", 6)
    val eow = BpeTrainer.tokenizeEow(docs, "text", merges)
      .select(col("doc_id"), col("tokens"),
        BpeTrainer.detokenize(col("tokens")).as("detok"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getString(2))).toMap
    val plain = BpeTrainer.tokenize(docs, "text", merges)
      .select(col("doc_id"), size(col("tokens")))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val norm = r.getString(1).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(eow(id)._2 == norm, s"doc $id detok mismatch")
      // marker rides an existing piece: counts identical
      assert(eow(id)._1.length == plain(id), s"doc $id piece count")
      // every word contributes exactly one marker
      assert(eow(id)._1.count(_.endsWith(BpeTrainer.Eow)) ==
        norm.split(" ").length)
    }
  }
}
