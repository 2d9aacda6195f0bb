package graft

/** The library's SQL surface: custom Catalyst functions usable from pure
  * SQL, registered at runtime or via SparkSessionExtensions. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim and topk_by_score usable from pure SQL") {
    GraftFunctions.register(spark)
    Seq(
      (1L, "a", Array(1.0f, 0.0f)),
      (2L, "a", Array(0.6f, 0.8f)),
      (3L, "b", Array(0.0f, 1.0f)),
    ).toDF("id", "grp", "emb").createOrReplaceTempView("vecs")

    val sim = spark.sql(
      "SELECT id, cosine_sim(emb, array(1.0f, 0.0f)) AS s FROM vecs ORDER BY id")
      .collect()
    assert(sim(0).getDouble(1) == 1.0)
    assert(math.abs(sim(1).getDouble(1) - 0.6) < 1e-7)

    val top = spark.sql(
      """SELECT grp, topk_by_score(cosine_sim(emb, array(1.0f, 0.0f)), id, 1) AS t
        |FROM vecs GROUP BY grp ORDER BY grp""".stripMargin).collect()
    assert(top.length == 2)
    val topA = top(0).getSeq[org.apache.spark.sql.Row](1)
    assert(topA.length == 1 && topA.head.getLong(1) == 1L)
    spark.catalog.dropTempView("vecs")
  }

  test("GraftExtensions applies cleanly to a SparkSessionExtensions") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts) // builder-injection path wires up
  }

  test("text/ttl functions usable from pure SQL, same results as Column API") {
    GraftFunctions.register(spark)
    Seq(
      (1L, "the cat and the dog, it is fine"),
      (2L, "el perro de la casa que ladra y"),
      (3L, ""),
    ).toDF("id", "text").createOrReplaceTempView("docs_sql")
    val rows = spark.sql(
      """SELECT id, lang_id(text) AS lang, token_count(text) AS toks,
        |  bpe_token_count(text) AS bpe, quality_score(text) AS q,
        |  doc_fingerprint(text) AS fp
        |FROM docs_sql ORDER BY id""".stripMargin).collect()
    assert(rows(0).getString(1) == "en")
    assert(rows(1).getString(1) == "es")
    assert(rows(2).getString(1) == "und")
    assert(rows(0).getInt(2) == 8)
    // Column-API parity on the same data
    import org.apache.spark.sql.functions.col
    val viaColumns = spark.table("docs_sql")
      .select(col("id"), graft.text.TextFunctions.langId(col("text")),
        graft.text.TextFunctions.fingerprint(col("text")))
      .orderBy("id").collect()
    rows.zip(viaColumns).foreach { case (a, b) =>
      assert(a.getString(1) == b.getString(1))
      assert(a.getLong(5) == b.getLong(2))
    }
    val ttl = spark.sql(
      "SELECT ttl_seconds(DATE'2024-01-03', DATE'2024-01-01') AS t").collect()
    assert(ttl(0).getLong(0) == 43200L) // <=7 days ahead tier
    spark.catalog.dropTempView("docs_sql")
  }

  test("hll_distinct usable from pure SQL") {
    GraftFunctions.register(spark)
    spark.range(3).selectExpr("concat('v', id % 3) AS t")
      .createOrReplaceTempView("hll_sql")
    val est = spark.sql("SELECT hll_distinct(t, 9) AS e FROM hll_sql")
      .head().getLong(0)
    assert(est == 3L)
    spark.catalog.dropTempView("hll_sql")
  }

  test("hist_quantile usable from pure SQL, matches Column API") {
    GraftFunctions.register(spark)
    spark.range(1, 1001).selectExpr("CAST(id AS DOUBLE) AS v")
      .createOrReplaceTempView("hq_sql")
    val viaSql = spark.sql(
      "SELECT hist_quantile(v, 0.5, 0.0, 1000.0, 100) AS e FROM hq_sql")
      .head().getDouble(0)
    val viaCol = spark.table("hq_sql")
      .agg(graft.sketch.HistQuantile.hist_quantile(
        org.apache.spark.sql.functions.col("v"), 0.5, 0.0, 1000.0, 100))
      .head().getDouble(0)
    assert(viaSql == viaCol)
    assert(math.abs(viaSql - 500.0) <= 10.0)
    spark.catalog.dropTempView("hq_sql")
  }
}
