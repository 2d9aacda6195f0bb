package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-step BPE tokenizer training (Sennrich et al. 2016) — the
  * iterative extension of q89's single merge step. Like q89, counting
  * runs on the word VOCABULARY weighted by word frequency, never on the
  * corpus: the per-iteration cost is independent of corpus size (the
  * standard trick — a 100 TB corpus and its 10 M-type vocabulary train
  * identical tokenizers), so `train` is one corpus-grain aggregate up
  * front plus `nMerges` vocabulary-grain jobs.
  *
  * Each iteration: segment every vocab word under the merges learned so
  * far (map-side, deterministic), explode adjacent symbol pairs
  * weighted by word frequency, ONE pair-grain aggregate, and the argmax
  * pair (freq desc, then lexicographic — deterministic ties) becomes
  * the next merge. Driver state is the merge list only.
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Apply a merge sequence to a word's character segmentation — the
    * greedy in-order replay every BPE implementation uses. The initial
    * segmentation is one CODEPOINT per symbol (not UTF-16 code units —
    * surrogate halves of non-BMP characters must never be split, and
    * the DuckDB oracle's substr() counts codepoints). */
  def applyMerges(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] = {
      val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out.toArray
    }
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Learn `nMerges` merges from the corpus. */
  def train(df: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val vocab = TextFunctions.unigrams(df, textCol)
      .groupBy(col("_w").as("w")).agg(count(lit(1)).as("wf"))
      // the vocabulary is tiny relative to the corpus (types, not
      // tokens); packing it into few partitions trims the per-merge
      // task-launch overhead (3.9 s → 3.3 s for 20 merges at sf0.1 —
      // the remaining floor is one pair-grain aggregate job per merge)
      .coalesce(4)
      .persist()
    try {
      vocab.count()
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var rank = 1
      while (rank <= nMerges) {
        val sofar = merges.map(m => (m.left, m.right)).toSeq
        val seg = udf((w: String) => applyMerges(w, sofar))
        val top = vocab
          .select(col("wf"), seg(col("w")).as("_s"))
          .filter(size(col("_s")) >= 2)
          .select(col("wf"), posexplode(col("_s")).as(Seq("_p", "_l")),
            col("_s"))
          .filter(col("_p") < size(col("_s")) - 1)
          .select(col("_l"),
            element_at(col("_s"), col("_p") + 2).as("_r"), col("wf"))
          .groupBy(col("_l"), col("_r")).agg(sum(col("wf")).as("_f"))
          .orderBy(col("_f").desc, col("_l"), col("_r"))
          .limit(1)
          .collect()
        if (top.isEmpty) return merges.toSeq // vocabulary fully merged
        val r0 = top(0)
        merges += Merge(rank, r0.getString(0), r0.getString(1), r0.getLong(2))
        rank += 1
      }
      merges.toSeq
    } finally { vocab.unpersist(); () }
  }

  /** Tokenize text under a learned merge list: (original columns...,
    * tokens array). Pure map-side. */
  def tokenize(df: DataFrame, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    // the word split is the SAME Spark expression unigrams uses —
    // only the merge replay lives in the UDF, so a tokenization tweak
    // in TextFunctions cannot diverge training counts from tokenize
    val applyU = udf { (ws: Seq[String]) =>
      if (ws == null) Array.empty[String]
      else ws.iterator.filter(_.nonEmpty)
        .flatMap(w => applyMerges(w, pairs)).toArray
    }
    df.withColumn("tokens",
      applyU(split(trim(lower(col(textCol))), "\\s+")))
  }

  /** End-of-word marker (U+241F SYMBOL FOR UNIT SEPARATOR — outside
    * every natural vocabulary): appended to a word's FINAL piece so
    * the token stream is losslessly invertible, the boundary-marking
    * convention every production BPE uses (Sennrich's `</w>`,
    * SentencePiece's `▁` — same role, different placement). */
  val Eow = "␟"

  /** [[tokenize]] with the [[Eow]] marker on each word's last piece —
    * same piece COUNT as tokenize (the marker rides an existing piece),
    * but the stream now round-trips through [[detokenize]]. */
  def tokenizeEow(df: DataFrame, textCol: String,
                  merges: Seq[Merge]): DataFrame = {
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val applyU = udf { (ws: Seq[String]) =>
      if (ws == null) Array.empty[String]
      else ws.iterator.filter(_.nonEmpty).flatMap { w =>
        val ps = applyMerges(w, pairs)
        ps(ps.length - 1) += Eow
        ps
      }.toArray
    }
    df.withColumn("tokens",
      applyU(split(trim(lower(col(textCol))), "\\s+")))
  }

  /** Invert an [[tokenizeEow]] stream back to the normalized text
    * (lowercased, single-space words) — the lossless-detokenization
    * property a serving pipeline depends on. */
  def detokenizeStr(tokens: Seq[String]): String =
    tokens.mkString("").replace(Eow, " ").stripSuffix(" ")

  /** Column form of [[detokenizeStr]]. */
  val detokenize: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (ts: Seq[String]) =>
      if (ts == null) null else detokenizeStr(ts)
    }
}
