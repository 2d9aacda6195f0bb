package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * builtins (no UDFs in the hot path) so a 100 TB documents scan stays
  * inside WholeStageCodegen with the text column as the only read column.
  */
object TextFunctions {

  /** Whitespace token count; empty/blank text → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish tokenizer count: words OR single non-space punctuation, the
    * usual pre-tokenization regex shape (`\w+|[^\w\s]`). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Count of regex word matches of any of `words` (word-boundary). */
  def wordMatchCount(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + words.map(java.util.regex.Pattern.quote).mkString("|") + ")\\b"),
      lit(0)))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0)))

  /** Stopword-ratio quality score in [0,1]: stopword tokens / tokens.
    * A length/punct/stopword heuristic in the C4/Gopher-rules family. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  def stopwordCount(text: Column): Column = wordMatchCount(text, EnStopwords)

  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text)
    when(toks === 0, lit(0.0)).otherwise(
      round(stopwordCount(text).cast("double") / toks.cast("double"), 4))
  }

  /** Language-ID by stopword-profile voting: score the text against each
    * language's tiny stopword list, predict the argmax (ties → language
    * order below, then 'und' when nothing matches). N-gram-profile
    * heuristic in the textcat family, restricted to word-level evidence
    * so it is exactly expressible in ANSI SQL for the oracle. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("de", "le", "shi", "wo", "ni"),
  )

  def langId(text: Column): Column = {
    val scores = LangProfiles.map { case (lang, words) =>
      (lang, wordMatchCount(text, words))
    }
    // argmax with strictly-greater so earlier languages win ties
    val best = scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) { case ((bl, bs), (l, s)) =>
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    when(best._2 === 0, lit("und")).otherwise(best._1)
  }

  /** Word n-gram shingles (the unit for Jaccard/MinHash dedup). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    // sliding n-grams: join tokens i..i+n-1; empty when fewer than n tokens
    when(length(trim(text)) === 0 || size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** 64-bit rolling polynomial document fingerprint over whitespace
    * tokens — see [[RollingHash]] (custom codegen expression; wrapping
    * arithmetic is intentional and ANSI-safe there). */
  def fingerprint(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val toks = split(trim(text), "\\s+")
    ColumnBridge.column(RollingHash(ColumnBridge.expression(toks)))
  }
}
