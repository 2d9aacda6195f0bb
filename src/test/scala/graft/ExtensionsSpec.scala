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
}
