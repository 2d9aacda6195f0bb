package graft

import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace, BPE-ish, empty text") {
    val df = Seq("the quick brown fox", "a,b c!", "", "   ").toDF("t")
    val got = df.select(
      TextFunctions.tokenCount($"t"),
      TextFunctions.bpeTokenCount($"t"),
      TextFunctions.punctCount($"t")).collect()
    assert(got(0).getInt(0) == 4 && got(0).getInt(1) == 4 && got(0).getInt(2) == 0)
    assert(got(1).getInt(0) == 2)       // "a,b" "c!"
    assert(got(1).getInt(1) == 5)       // a , b c !
    assert(got(1).getInt(2) == 2)       // , !
    assert(got(2).getInt(0) == 0 && got(3).getInt(0) == 0)
  }

  test("quality score = stopword ratio") {
    val got = Seq("the cat is on a mat").toDF("t")
      .select(TextFunctions.qualityScore($"t")).as[Double].head()
    assert(got == 0.5) // the, is, a -> 3 stopwords of 6 tokens
  }

  test("language id picks profile with most stopword hits, und on none") {
    val df = Seq(
      "the cat and the dog is of note",
      "el gato y la casa de que",
      "der hund und die katze ist das",
      "xyzzy qwerty",
    ).toDF("t")
    val got = df.select(TextFunctions.langId($"t")).as[String].collect()
    assert(got(0) == "en")
    assert(got(1) == "es")
    assert(got(2) == "de")
    assert(got(3) == "und")
  }

  test("shingles: sliding n-grams, short text empty") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(TextFunctions.shingles($"t", 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("fingerprint: deterministic, order-sensitive, distinct for distinct docs") {
    val df = Seq("a b c", "a b c", "c b a", "totally different").toDF("t")
    val fp = df.select(TextFunctions.fingerprint($"t")).as[Long].collect()
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2)) // rolling hash is order-sensitive
    assert(fp(0) != fp(3))
  }

  test("repeatedSpans: detects windows repeating earlier in the same doc, merges adjacent repeats") {
    val docs = Seq(
      // every window from p=3 on repeats an earlier one (abc/bca/cab
      // cycle): starts 3,4,5,6 are consecutive → 4 repeated windows in
      // ONE merged span
      (1L, "a b c a b c a b c"),
      // "x y z" repeats at p=10 and p=20: starts 10 and 20 are > gap=3
      // apart → 2 repeated windows, TWO spans
      (2L, "x y z q w e r t u i x y z p a s d f g h x y z"),
      // all seven 3-token windows distinct → no intra-doc repeats (the
      // cross-DOC vocabulary overlap with doc 1 is irrelevant)
      (3L, "c c b b a a c b a"),
      (4L, ""),
    ).toDF("doc_id", "text")
    val out = TextFunctions.repeatedSpans(docs, "text", "doc_id",
        window = 3, gap = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((4L, 1L)))
    assert(out(2L) == ((2L, 2L)))
    assert(!out.contains(3L) && !out.contains(4L))
  }

  test("gopherRepetition: mode-word / top-2-gram / dup-3-gram fractions") {
    val docs = Seq(
      (1L, "a a a b c"),            // topw 3/5, top2 "a a" 2/4, dup3 0
      (2L, "spam spam spam spam"),  // everything degenerate
      (3L, "w01 w02 w03 w04 w05 w06 w07 w08 w09 w10 " +
           "w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"), // all distinct
      (4L, "solo"),                 // no 2-/3-grams at all
      (5L, "   "),                  // blank -> filtered out
    ).toDF("doc_id", "text")
    val out = TextFunctions.gopherRepetition(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5))).toMap
    assert(out(1L) == ((5L, 0.6, 0.5, 0.0, false)))
    assert(out(2L) == ((4L, 1.0, 1.0, 0.5, false)))
    assert(out(3L) == ((20L, 0.05, 0.0526, 0.0, true)))
    assert(out(4L) == ((1L, 1.0, 0.0, 0.0, false)))
    assert(!out.contains(5L))
  }

  test("gopherQuality: word length, alpha fraction, stopword hits") {
    val docs = Seq(
      (1L, "the dog runs with joy"), // mwl 3.4, stops the+with=2 -> keep
      (2L, "zz yy xx ww vv"),        // zero stopword hits -> drop
      (3L, "12 34 56 aa the with"),  // alpha 3/6 = 0.5 -> drop
    ).toDF("doc_id", "text")
    val out = TextFunctions.gopherQuality(docs, "text", "doc_id",
        minWords = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(out(1L) == ((5L, 3.4, 1.0, 2L, true)))
    assert(out(2L)._4 == 0L && !out(2L)._5)
    assert(out(3L)._3 == 0.5 && !out(3L)._5)
  }

  test("GzipText: round-trip exact incl. non-ASCII; corrupt/bomb/non-gzip " +
      "payloads -> NULL; SQL surface == Column API") {
    import graft.text.GzipText
    // byte-exact round-trip, including multi-byte UTF-8 and empty
    Seq("", "plain ascii", "naïve — ünïcode ✓ " + "x" * 10000,
        "a\nb\tc\u0000d").foreach { s =>
      assert(GzipText.gunzipBytes(GzipText.gzipBytes(s)).contains(s))
    }
    // non-gzip bytes and a corrupted member degrade to None, not throw
    assert(GzipText.gunzipBytes("not gzip at all".getBytes).isEmpty)
    val corrupt = GzipText.gzipBytes("hello world, hello world")
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x55).toByte
    assert(GzipText.gunzipBytes(corrupt).isEmpty)
    // bomb guard: 128 MiB of zeros inflates past MaxBytes -> None,
    // bounded memory (the compressed member is a few hundred KB)
    val bomb = {
      val buf = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(buf)
      val chunk = new Array[Byte](1 << 20)
      (0 until 128).foreach(_ => gz.write(chunk))
      gz.close()
      buf.toByteArray
    }
    assert(GzipText.gunzipBytes(bomb).isEmpty)
    // SQL surface over a mixed column: inflated text for real members,
    // NULL for garbage — one malformed cell never fails the scan
    GraftFunctions.register(spark)
    Seq((1L, GzipText.gzipBytes("round trip")),
        (2L, "garbage".getBytes))
      .toDF("id", "payload").createOrReplaceTempView("gz_sql")
    val rows = spark.sql(
      """SELECT id, gunzip_text(payload) AS t,
        | gunzip_text(gzip_text('via sql')) AS t2
        |FROM gz_sql ORDER BY id""".stripMargin).collect()
    assert(rows(0).getString(1) == "round trip")
    assert(rows(1).isNullAt(1))
    assert(rows.forall(_.getString(2) == "via sql"))
    spark.catalog.dropTempView("gz_sql"): Unit
  }

  test("gopherGateKeep == repetition.keep AND quality.keep on real docs") {
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
    val got = docs.select(col("doc_id"),
        TextFunctions.gopherGateKeep(col("text")).as("fused"),
        (TextFunctions.gopherRepetitionStruct(col("text"))("keep") &&
          TextFunctions.gopherQualityStruct(col("text"))("keep"))
          .as("separate"))
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getBoolean(1) == r.getBoolean(2)))
    // both gate outcomes occur on the corpus (the equality is not
    // vacuous)
    assert(got.exists(_.getBoolean(1)) && got.exists(!_.getBoolean(1)))
  }
}
