package graft

import graft.text.AhoCorasick

class MultiMatchSpec extends SparkSpec {

  /** Brute-force position scan — the oracle's semantics. */
  private def brute(text: String, patterns: Seq[String]): Array[Int] =
    patterns.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i))
    }.toArray

  test("nested patterns count via failure-output links") {
    val pats = Seq("table", "tab", "ab", "le", "a")
    val ac = AhoCorasick.build(pats)
    val got = ac.countMatches("a table")
    // "a table": a x2, tab x1, table x1, ab x1, le x1
    assert(got.toSeq == brute("a table", pats).toSeq)
    assert(got.toSeq == Seq(1, 1, 1, 1, 2))
  }

  test("overlapping occurrences all counted") {
    val pats = Seq("aa", "aaa")
    val ac = AhoCorasick.build(pats)
    assert(ac.countMatches("aaaa").toSeq == Seq(3, 2))
  }

  test("matches equal brute force on generated strings") {
    val pats = Seq("scan", "can", "an", "a", "fast sort", "rde",
      "order", "value", "al", "zebra")
    val ac = AhoCorasick.build(pats)
    val rnd = new scala.util.Random(42)
    val vocab = "scan can order value fast sort a zeb".split(' ')
    (1 to 200).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
      assert(ac.countMatches(s).toSeq == brute(s, pats).toSeq, s"text: $s")
    }
  }

  test("empty text, null text, absent patterns") {
    val ac = AhoCorasick.build(Seq("x", "yy"))
    assert(ac.countMatches("").toSeq == Seq(0, 0))
    assert(ac.countMatches(null).toSeq == Seq(0, 0))
    assert(ac.countMatches("zzz").toSeq == Seq(0, 0))
  }

  test("single pass beats per-pattern scans on the automaton shape") {
    // structural, not timing: the walk visits each char once
    val pats = (1 to 50).map(i => s"pat$i")
    val ac = AhoCorasick.build(pats)
    val counts = ac.countMatches("pat1 pat25 pat50 pat500")
    assert(counts(0) == 1 && counts(24) == 1)
    // "pat500" contains "pat50" then '0' — pat50 still counted there
    assert(counts(49) == 2)
  }

  test("column form over a DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq((1L, "a table"), (2L, "no hits here?"))
      .toDF("id", "t")
      .select(col("id"),
        AhoCorasick.countsUdf(Seq("table", "tab", "a"))(col("t")).as("m"))
      .selectExpr("id", "m._1 as total", "m._2 as distinct_pats")
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(got(0) == ((1L, 4L, 3L))) // table, tab, a x2
    assert(got(1) == ((2L, 0L, 0L)))
  }
}
