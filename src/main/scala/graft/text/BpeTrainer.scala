package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-step BPE tokenizer training (Sennrich et al. 2016) — the
  * iterative extension of q89's single merge step. Like q89, counting
  * runs on the word VOCABULARY weighted by word frequency, never on the
  * corpus: the per-iteration cost is independent of corpus size (the
  * standard trick — a 100 TB corpus and its 10 M-type vocabulary train
  * identical tokenizers). `train` is one corpus-grain aggregate up
  * front, then — r12 — EITHER a driver-resident merge loop (vocab ≤
  * [[DriverVocabMaxTypes]] types: 20 distributed iterations were pure
  * job-launch overhead) OR `nMerges` vocabulary-grain jobs, identical
  * counting and argmax either way.
  *
  * Each distributed iteration: segment every vocab word under the
  * merges learned so far (map-side, deterministic), explode adjacent
  * symbol pairs weighted by word frequency, ONE pair-grain aggregate,
  * and the argmax pair (freq desc, then binary-string order —
  * deterministic ties) becomes the next merge. Driver state is the
  * merge list (plus, on the fast path, the bounded vocabulary).
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** One CODEPOINT per symbol (not UTF-16 code units — surrogate halves
    * of non-BMP characters must never be split, and the DuckDB oracle's
    * substr() counts codepoints). */
  private def initCodepoints(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** The GPT-2 bytes↔unicode bijection: every byte 0-255 maps to ONE
    * printable BMP codepoint — visible ASCII (33-126) and the Latin-1
    * block minus NBSP/SHY (161-172, 174-255) map to themselves; the 68
    * remaining bytes (controls, space, DEL, 127-160, 173) shift to
    * 256+n in byte order, so byte 32 is the famous 'Ġ' (U+0120). Makes
    * byte-level segmentation OOV-free over arbitrary UTF-8 while every
    * symbol stays a plain 1-codepoint string the SQL oracle can
    * segment with substr()/chr(). */
  private[text] val ByteToChar: Array[Char] = {
    val arr = new Array[Char](256)
    var shifted = 0
    var b = 0
    while (b < 256) {
      if ((b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
          (b >= 174 && b <= 255)) arr(b) = b.toChar
      else { arr(b) = (256 + shifted).toChar; shifted += 1 }
      b += 1
    }
    arr
  }

  private[text] val CharToByte: Map[Char, Int] =
    ByteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** One UTF-8 BYTE per symbol, each byte carried as its bijection
    * character. */
  private def initBytes(word: String): Array[String] = {
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bs.length)
    var i = 0
    while (i < bs.length) {
      out(i) = String.valueOf(ByteToChar(bs(i) & 0xff))
      i += 1
    }
    out
  }

  /** Greedy in-order merge replay over an initial segmentation — the
    * loop every BPE implementation uses (left-to-right, non-overlapping,
    * one pass per merge rank). */
  private def runMerges(init: Array[String],
                        merges: Seq[(String, String)]): Array[String] = {
    var syms = init
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

  /** Apply a merge sequence to a word's CODEPOINT segmentation. */
  def applyMerges(word: String, merges: Seq[(String, String)]): Array[String] =
    runMerges(initCodepoints(word), merges)

  /** Apply a merge sequence to a word's BYTE segmentation (UTF-8 bytes
    * through [[ByteToChar]]) — the GPT-2/LLaMA-family grain. */
  def applyMergesBytes(word: String,
                       merges: Seq[(String, String)]): Array[String] =
    runMerges(initBytes(word), merges)

  /** Size guard for the driver-resident training fast path: vocabularies
    * under this many TYPES train in one collect + in-memory loop (the
    * r12 measurement: 20 distributed merge iterations were pure
    * driver-side job-launch/planning overhead — q195 wall 4.5 s vs
    * 1.6 s of stage time). Above it, the distributed vocabulary-grain
    * loop runs unchanged — the same size-guard-with-distributed-fallback
    * contract as Dedup's union-find. ~2M types ≈ tens of MB of driver
    * state (words + segmentations), far under the codebook-scale
    * driver budget; a 100 TB corpus' 10M-type vocabulary takes the
    * distributed loop. */
  private val DriverVocabMaxTypes = 2000000L

  /** Spark string ordering is UTF8String BINARY order (UTF-8 bytes),
    * which differs from Java's UTF-16 order for non-BMP codepoints —
    * the tie-break of the argmax must replay it exactly. */
  private def binaryLt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  /** Driver-side twin of the distributed iteration: identical counting
    * (every adjacent occurrence, weighted by word frequency) and
    * identical argmax (freq desc, then (left, right) in binary string
    * order); segmentations update incrementally — applying merge k to
    * the result of merges 1..k-1 is exactly [[runMerges]]' in-order
    * replay. */
  private def trainDriver(rows: Array[(String, Long)], nMerges: Int,
                          init: String => Array[String]): Seq[Merge] = {
    val segs = rows.map { case (w, _) => init(w) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    while (rank <= nMerges) {
      val counts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < segs.length) {
        val s = segs(wi)
        if (s.length >= 2) {
          val wf = rows(wi)._2
          var i = 0
          while (i < s.length - 1) {
            counts.merge((s(i), s(i + 1)), wf, (a, b) => a + b)
            i += 1
          }
        }
        wi += 1
      }
      if (counts.isEmpty) return merges.toSeq
      var best: ((String, String), Long) = null
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (best == null || e.getValue > best._2 ||
            (e.getValue == best._2 &&
              (binaryLt(e.getKey._1, best._1._1) ||
                (e.getKey._1 == best._1._1 &&
                  binaryLt(e.getKey._2, best._1._2)))))
          best = (e.getKey, e.getValue)
      }
      val (l, r) = best._1
      merges += Merge(rank, l, r, best._2)
      wi = 0
      while (wi < segs.length) {
        val s = segs(wi)
        if (s.length >= 2) segs(wi) = runMerges(s, Seq((l, r)))
        wi += 1
      }
      rank += 1
    }
    merges.toSeq
  }

  /** The per-iteration loop shared by both grains: segment every vocab
    * word under the merges learned so far, explode adjacent pairs
    * weighted by word frequency, ONE pair-grain aggregate, argmax. */
  private def trainLoop(vocab: DataFrame, nMerges: Int,
                        apply: (String, Seq[(String, String)]) => Array[String],
                        init: String => Array[String])
      : Seq[Merge] = {
    try {
      val nTypes = vocab.count()
      if (nTypes <= DriverVocabMaxTypes) {
        val rows = vocab.collect()
          .map(r => (r.getString(0), r.getLong(1)))
        return trainDriver(rows, nMerges, init)
      }
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var rank = 1
      while (rank <= nMerges) {
        val sofar = merges.map(m => (m.left, m.right)).toSeq
        val seg = udf((w: String) => apply(w, sofar))
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

  /** Learn `nMerges` merges from the corpus (codepoint grain, lowercased
    * words — the q89/q195/q197 tokenizer family). */
  def train(df: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val vocab = TextFunctions.unigrams(df, textCol)
      .groupBy(col("_w").as("w")).agg(count(lit(1)).as("wf"))
      // the vocabulary is tiny relative to the corpus (types, not
      // tokens); packing it into few partitions trims the per-merge
      // task-launch overhead (3.9 s → 3.3 s for 20 merges at sf0.1 —
      // the remaining floor is one pair-grain aggregate job per merge)
      .coalesce(4)
      .persist()
    trainLoop(vocab, nMerges, applyMerges, initCodepoints)
  }

  /** Learn `nMerges` merges at BYTE grain — no lowercasing, no
    * normalization beyond whitespace word-splitting: the production
    * byte-level contract (GPT-2 family) where ANY UTF-8 input is
    * in-alphabet by construction. Same vocabulary-grain cost shape as
    * [[train]]. */
  def trainBytes(df: DataFrame, textCol: String, nMerges: Int): Seq[Merge] = {
    val vocab = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("wf"))
      .coalesce(4)
      .persist()
    trainLoop(vocab, nMerges, applyMergesBytes, initBytes)
  }

  /** Per-TASK segmentation memo (r12): the merge replay is a pure
    * function of (word, merges), and a Zipf corpus re-tokenizes the
    * same types millions of times — memoizing turns O(tokens) replays
    * into O(types) replays + hash lookups. The map rides the task
    * closure, so every task (and every run) starts EMPTY — this is
    * per-task computation reuse, never a cross-run result cache. Size
    * cap bounds task memory on adversarial (all-distinct) vocabularies. */
  private val MemoMaxTypes = 1 << 20

  private def memoized(apply: (String, Seq[(String, String)]) => Array[String],
                       pairs: Seq[(String, String)]): String => Array[String] = {
    // serialized EMPTY into the task closure; concurrent for the case of
    // a shared deserialized closure — the memo is pure either way
    val cache = new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    (w: String) => {
      var r = cache.get(w)
      if (r == null) {
        r = apply(w, pairs)
        if (cache.size < MemoMaxTypes) cache.put(w, r)
      }
      r
    }
  }

  /** Tokenize text under a learned merge list: (original columns...,
    * tokens array). Pure map-side. */
  def tokenize(df: DataFrame, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    // the word split is the SAME Spark expression unigrams uses —
    // only the merge replay lives in the UDF, so a tokenization tweak
    // in TextFunctions cannot diverge training counts from tokenize
    val m = memoized(applyMerges, pairs)
    val applyU = udf { (ws: Seq[String]) =>
      if (ws == null) Array.empty[String]
      else ws.iterator.filter(_.nonEmpty).flatMap(w => m(w)).toArray
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
    val m = memoized(applyMerges, pairs)
    val applyU = udf { (ws: Seq[String]) =>
      if (ws == null) Array.empty[String]
      else ws.iterator.filter(_.nonEmpty).flatMap { w =>
        // copy before marking: the memoized segmentation is shared
        val base = m(w)
        val ps = java.util.Arrays.copyOf(base, base.length)
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

  /** Byte-grain [[tokenizeEow]]: words split on whitespace (case and
    * every byte PRESERVED — no lower()), segmented at UTF-8 byte grain
    * through [[ByteToChar]], merges replayed, [[Eow]] on each word's
    * final piece. OOV-free over arbitrary UTF-8 by construction. */
  def tokenizeBytesEow(df: DataFrame, textCol: String,
                       merges: Seq[Merge]): DataFrame = {
    val pairs = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val m = memoized(applyMergesBytes, pairs)
    val applyU = udf { (ws: Seq[String]) =>
      if (ws == null) Array.empty[String]
      else ws.iterator.filter(_.nonEmpty).flatMap { w =>
        // copy before marking: the memoized segmentation is shared
        val base = m(w)
        val ps = java.util.Arrays.copyOf(base, base.length)
        ps(ps.length - 1) += Eow
        ps
      }.toArray
    }
    df.withColumn("tokens", applyU(split(trim(col(textCol)), "\\s+")))
  }

  /** Invert a [[tokenizeBytesEow]] stream byte-for-byte: pieces
    * concatenate, [[Eow]] closes each word, bijection characters map
    * back to their bytes, and the bytes UTF-8-decode to the original
    * words (single-space joined — exactly the whitespace class the
    * word split normalized, nothing else). Total: a piece character
    * outside the bijection alphabet cannot occur in a tokenizeBytesEow
    * stream, so CharToByte is total over real inputs. */
  def detokenizeBytesStr(tokens: Seq[String]): String = {
    val joined = tokens.mkString("")
    joined.split(Eow.charAt(0)).map { w =>
      val bs = new Array[Byte](w.length)
      var i = 0
      while (i < w.length) { bs(i) = CharToByte(w.charAt(i)).toByte; i += 1 }
      new String(bs, java.nio.charset.StandardCharsets.UTF_8)
    }.mkString(" ")
  }

  /** Column form of [[detokenizeBytesStr]]. */
  val detokenizeBytes: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (ts: Seq[String]) =>
      if (ts == null) null else detokenizeBytesStr(ts)
    }
}
