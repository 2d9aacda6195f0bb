package graft

import graft.dedup.Dedup
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Line-grain corpus dedup (CCNet/RefinedWeb boilerplate removal) and
  * domain-cap curation (FineWeb per-domain contribution cap). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val pages = Seq(
    (1L, "Cookie banner\nunique body one\n\nCookie banner\nFooter nav"),
    (2L, "Cookie banner\nunique body two\nFooter nav"),
    (3L, "unique body three\n  Footer nav  \nmore unique text"),
    (4L, "totally original page\nno shared lines at all"),
    (5L, ""),
  ).toDF("doc_id", "text")

  test("duplicatedLines finds lines shared by >= minDocs distinct docs") {
    val blk = Dedup.duplicatedLines(pages, "text", "doc_id")
      .select("line", "n_docs").as[(String, Long)].collect().toMap
    assert(blk == Map("Cookie banner" -> 2L, "Footer nav" -> 3L))
  }

  test("dedupLines removes EVERY copy, keeps order, keeps blank lines") {
    val out = Dedup.dedupLines(pages, "text", "doc_id")
      .select("doc_id", "cleaned", "n_lines", "n_removed")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1: both banner copies AND the footer go; blank line survives
    assert(out(1L) == (("unique body one\n", 5L, 3L)))
    assert(out(2L) == (("unique body two", 3L, 2L)))
    // trim-normalized match: "  Footer nav  " is the same line
    assert(out(3L) == (("unique body three\nmore unique text", 3L, 1L)))
    // untouched doc round-trips byte-identically
    assert(out(4L) == (("totally original page\nno shared lines at all",
      2L, 0L)))
    // empty doc: one empty line, kept
    assert(out(5L) == (("", 1L, 0L)))
  }

  test("dedupLines honors the minDocs threshold") {
    val out = Dedup.dedupLines(pages, "text", "doc_id", minDocs = 3)
      .select("doc_id", "n_removed").as[(Long, Long)].collect().toMap
    // only "Footer nav" (3 docs) is boilerplate at minDocs=3
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
  }

  private val corpus = Seq(
    ("a.com", 1L, 100L, "en"), ("a.com", 2L, 300L, "en"),
    ("a.com", 3L, 200L, "fr"), ("a.com", 4L, 300L, "de"),
    ("b.com", 5L, 50L, "en"),
    ("c.com", 6L, 10L, "en"), ("c.com", 7L, 20L, "en"),
  ).toDF("source", "doc_id", "n_chars", "lang")

  test("domainCap keeps top-N per domain by order, id tiebreak") {
    val kept = Curation.domainCap(corpus, "source", "doc_id",
        col("n_chars").desc, maxPerDomain = 2)
      .select("doc_id", "domain_rank").as[(Long, Int)].collect().toMap
    // a.com: 300-char docs 2 and 4 tie — doc_id breaks it; doc 1/3 cut
    assert(kept == Map(2L -> 1, 4L -> 2, 5L -> 1, 6L -> 2, 7L -> 1))
  }

  test("domainStats reports per-domain totals and capped aggregates") {
    val st = Curation.domainStats(corpus, "source", "doc_id", "n_chars",
        "lang", col("n_chars").desc, maxPerDomain = 2)
      .select("source", "n_docs", "n_kept", "kept_chars", "n_langs")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(st("a.com") == ((4L, 2L, 600L, 2L)))
    assert(st("b.com") == ((1L, 1L, 50L, 1L)))
    assert(st("c.com") == ((2L, 2L, 30L, 1L)))
  }

  test("selectByBudget equals the global-window greedy prefix") {
    // deterministic pseudo-random scores/tokens; nBands=10 forces many
    // docs per band so the boundary band is genuinely partial
    val docs = (1L to 500L).map { i =>
      val score = ((i * 7919) % 1000) / 1000.0
      val tokens = 1L + (i * 31) % 100
      (i, score, tokens)
    }.toDF("id", "score", "tokens")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Long.MinValue, 0)
    val budget = 5000L
    val expected = docs
      .withColumn("cum", sum(col("tokens")).over(w))
      .filter(col("cum") <= budget).drop("cum")
      .select("id").as[Long].collect().toSet
    val got = Curation.selectByBudget(docs, "score", "id", "tokens",
        budget, nBands = 10)
      .select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < 500) // boundary actually cut
  }

  test("shardByTokens equals the global-window exclusive prefix") {
    val docs = (1L to 400L).map(i => (i, 1L + (i * 31) % 100))
      .toDF("id", "tokens")
    val rk = md5(concat_ws(":", lit("shard"), col("id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(rk, col("id")).rowsBetween(Long.MinValue, -1)
    val budget = 1000L
    val expected = docs
      .withColumn("excl", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col("id"),
        expr(s"excl div ${budget}L").as("shard"))
      .as[(Long, Long)].collect().toMap
    val got = Curation.shardByTokens(docs, "id", "tokens", budget)
      .select(col("id"), col("shard")).as[(Long, Long)].collect().toMap
    assert(got == expected)
    // packing actually split the corpus into many shards
    assert(expected.values.toSet.size > 5)
  }

  test("selectByBudget: degenerate one-score corpus — no data-sized window") {
    // quantized classifier scores can put the WHOLE corpus in one band;
    // the boundary cumsum must still be exact AND must not serialize
    // the band through a single-partition window
    val docs = (1L to 2000L).map(i => (i, 0.5, 1L + (i * 31) % 100))
      .toDF("id", "score", "tokens")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Long.MinValue, 0)
    val budget = 20000L
    val expected = docs
      .withColumn("cum", sum(col("tokens")).over(w))
      .filter(col("cum") <= budget).drop("cum")
      .select("id").as[Long].collect().toSet
    val out = Curation.selectByBudget(docs, "score", "id", "tokens",
      budget, nBands = 10)
    val got = out.select("id").as[Long].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < 2000) // boundary actually cut
    // every Window in the plan runs over GlobalOrder's bounded
    // per-partition offsets frame (keyed _go_pid), never the band's data
    val plan = out.queryExecution.executedPlan.toString
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.forall(_.contains("_go_pid")),
      s"data-sized window in:\n${windowLines.mkString("\n")}")
  }

  test("selectByBudget fails fast on NULL scores") {
    val docs = Seq((1L, Some(0.9), 10L), (2L, None, 10L), (3L, Some(0.1), 10L))
      .toDF("id", "score", "tokens")
    val e = intercept[IllegalArgumentException] {
      Curation.selectByBudget(docs, "score", "id", "tokens", budget = 15L)
    }
    assert(e.getMessage.contains("NULL score"))
  }

  test("scrub-before-dedup collapses PII-only variants (q317 stage order)") {
    import graft.text.Pii
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // two crawls of the same page differing ONLY in the injected
    // contact line — the q317 dup arm in miniature
    val docs = Seq(
      (1L, "the same body text contact alice@a.example.com ip 10.0.0.1"),
      (8L, "the same body text contact bob.b@b.example.org ip 10.9.9.9"))
      .toDF("doc_id", "text")
    val scrubbed = docs.select(col("doc_id"), Pii.redact(col("text")).as("clean"))
    // raw hashes distinct: dedup-before-scrub would keep BOTH copies
    assert(docs.select(countDistinct(md5(col("text")))).head().getLong(0) == 2L)
    // scrubbed hashes collide; keep-first retains the earlier doc_id
    val kept = scrubbed
      .withColumn("_rn", row_number().over(
        Window.partitionBy(md5(col("clean"))).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1)
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("selectByBudget keeps everything when the corpus fits") {
    val docs = (1L to 50L).map(i => (i, (i % 10) / 10.0, 5L))
      .toDF("id", "score", "tokens")
    val got = Curation.selectByBudget(docs, "score", "id", "tokens",
        budget = 10000L)
      .select("id").as[Long].collect().toSet
    assert(got == (1L to 50L).toSet)
  }
}
