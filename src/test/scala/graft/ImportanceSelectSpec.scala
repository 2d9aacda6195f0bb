package graft

import graft.operators.ImportanceSelect

class ImportanceSelectSpec extends SparkSpec {
  import spark.implicits._

  test("DSIR weights prefer documents from the target distribution") {
    val raw = Seq(
      (1L, "cat cat kitten purr cat"),
      (2L, "dog dog bark growl dog"),
      (3L, "cat kitten dog purr"),   // mixed, cat-leaning
      (4L, "bark bark growl dog"),
    ).toDF("doc_id", "text")
    val target = Seq(
      (100L, "cat kitten purr cat"),
      (101L, "kitten cat purr"),
    ).toDF("doc_id", "text")
    val out = ImportanceSelect.dsirWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out.size == 4)
    assert(out(1L)._3, "pure-cat doc must be selected")
    assert(!out(2L)._3 && !out(4L)._3, "dog docs must not be selected")
    assert(out(1L)._2 > out(3L)._2 && out(3L)._2 > out(2L)._2,
      "weights must order cat > mixed > dog")
    assert(out(1L)._1 == 5L)
  }

  test("dsirRatioSplit == dsirRatio on a column-selected subset target," +
      " bit-for-bit") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.col("lang"))
    def rows(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val twoScan = rows(ImportanceSelect.dsirRatio(docs,
      docs.filter(org.apache.spark.sql.functions.col("lang") === "en"),
      "text"))
    val fused = rows(ImportanceSelect.dsirRatioSplit(docs,
      org.apache.spark.sql.functions.col("lang") === "en", "text"))
    // same longs into the same double expression — exact equality, no
    // tolerance (this is what lets the declared queries swap the form)
    assert(fused == twoScan && fused.nonEmpty)
  }

  test("weight is the average, so doc length alone does not change it") {
    val raw = Seq(
      (1L, "cat cat"),
      (2L, "cat cat cat cat cat cat cat cat"),
    ).toDF("doc_id", "text")
    val target = Seq((9L, "cat")).toDF("doc_id", "text")
    val out = ImportanceSelect.dsirWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == out(2L))
  }
}
