package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Hashed bag-of-words logistic regression — the fastText-style trained
  * quality classifier every production training-data pipeline runs
  * next to the heuristic rules (GPT-3's WebText-vs-CommonCrawl filter,
  * CCNet's fastText language/quality scores). The reference has no
  * trained filter; this extends the corpus surface like MixtureSample
  * and ImportanceSelect do.
  *
  * Layout and scale shape:
  *  - featurize ONCE into (id, label, idxs, vals): tokens hashed to
  *    `dim` buckets (xxhash64 — Spark-native, stable across sessions),
  *    per-doc term frequencies normalized by doc length; the frame is
  *    cached for the duration of training;
  *  - each full-batch iteration is ONE map pass (margin + residual per
  *    doc, weights riding the closure — `dim` doubles, KBs) plus ONE
  *    feature-grain aggregate (explode → groupBy idx → `dim` partial
  *    sums); the driver only ever holds the weight vector, exactly the
  *    distributed-LR shape of classic MLlib;
  *  - no per-iteration join-back: the residual is computed in the same
  *    projection that explodes the features.
  *
  * Full-batch gradient descent with a fixed step — deterministic given
  * the data (modulo float-sum ordering, which the recall-style gates
  * tolerate), no sampling, no early exit.
  */
object HashedLogReg {

  final case class Model(dim: Int, weights: Array[Double], bias: Double,
                         losses: Array[Double])

  /** (idCol, label, idxs, vals) — hashed tf features. `labelCol` must
    * be 0/1. */
  def featurize(df: DataFrame, textCol: String, labelExpr:
      org.apache.spark.sql.Column, idCol: String, dim: Int): DataFrame = {
    val tok = df
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), labelExpr.cast("double").as("_y"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("_w"))
      .filter(col("_w") =!= "")
      .select(col(idCol), col("_y"),
        pmod(xxhash64(col("_w")), lit(dim.toLong)).cast("int").as("_i"))
    tok.groupBy(col(idCol), col("_y"), col("_i"))
      .agg(count(lit(1)).cast("double").as("_c"))
      .groupBy(col(idCol), col("_y"))
      .agg(collect_list(col("_i")).as("_idxs"),
        collect_list(col("_c")).as("_cs"))
      .select(col(idCol), col("_y"), col("_idxs"),
        // normalized term frequency: x_i = count_i / doc_len
        transform(col("_cs"), c => c / aggregate(col("_cs"), lit(0.0d),
          (a, x) => a + x)).as("_vals"))
  }

  /** Train on a featurized frame (from [[featurize]]). Returns the
    * model plus the per-iteration mean log-loss trace. */
  def trainFeaturized(feats: DataFrame, dim: Int, iters: Int = 20,
                      lr: Double = 2.0): Model = {
    val cached = feats.persist()
    try {
      val n = cached.count().toDouble
      var w = new Array[Double](dim)
      var b = 0.0
      val losses = new Array[Double](iters)
      var it = 0
      while (it < iters) {
        val wNow = w; val bNow = b
        val marginUdf = udf { (idxs: Seq[Int], vals: Seq[Double]) =>
          var m = bNow; var i = 0
          while (i < idxs.length) { m += wNow(idxs(i)) * vals(i); i += 1 }
          m
        }
        val scored = cached
          .withColumn("_m", marginUdf(col("_idxs"), col("_vals")))
          .withColumn("_p", lit(1.0) / (lit(1.0) + exp(-col("_m"))))
          .withColumn("_r", col("_p") - col("_y"))
        // loss + bias gradient + per-feature gradient in one pass over
        // the exploded features, plus one tiny doc-grain aggregate
        val docAgg = scored.agg(
          avg(-(col("_y") * log(greatest(col("_p"), lit(1e-12))) +
            (lit(1.0) - col("_y")) *
              log(greatest(lit(1.0) - col("_p"), lit(1e-12))))).as("loss"),
          sum(col("_r")).as("gb")).head()
        losses(it) = docAgg.getDouble(0)
        val gb = docAgg.getDouble(1) / n
        val grad = scored
          .select(col("_r"),
            explode(arrays_zip(col("_idxs"), col("_vals"))).as("_f"))
          .select(col("_f._idxs").as("_i"),
            (col("_r") * col("_f._vals")).as("_g"))
          .groupBy(col("_i")).agg(sum(col("_g")).as("_gs"))
          .collect()
        val next = w.clone()
        grad.foreach(r => next(r.getInt(0)) -= lr * r.getDouble(1) / n)
        w = next
        b -= lr * gb
        it += 1
      }
      Model(dim, w, b, losses)
    } finally { cached.unpersist(); () }
  }

  def train(df: DataFrame, textCol: String,
            labelExpr: org.apache.spark.sql.Column, idCol: String,
            dim: Int = 1024, iters: Int = 20, lr: Double = 2.0): Model =
    trainFeaturized(featurize(df, textCol, labelExpr, idCol, dim), dim,
      iters, lr)

  /** Score documents: (idCol, prob). */
  def score(df: DataFrame, textCol: String, idCol: String,
            model: Model): DataFrame = {
    val feats = featurize(df, textCol, F.lit(0), idCol, model.dim)
    val w = model.weights; val b = model.bias
    val probUdf = udf { (idxs: Seq[Int], vals: Seq[Double]) =>
      var m = b; var i = 0
      while (i < idxs.length) { m += w(idxs(i)) * vals(i); i += 1 }
      1.0 / (1.0 + math.exp(-m))
    }
    feats.select(col(idCol), probUdf(col("_idxs"), col("_vals")).as("prob"))
  }
}
