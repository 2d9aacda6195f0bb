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
  *  - each full-batch iteration is ONE shuffle-free `aggregate`
  *    (weights riding the closure — `dim` doubles, KBs; every partition
  *    folds its docs into one dim+2 gradient array); the driver only
  *    ever holds the weight vector, exactly the distributed-LR shape of
  *    classic MLlib;
  *  - no per-iteration join-back or feature explode anywhere.
  *
  * Full-batch gradient descent with a fixed step — deterministic given
  * the data (modulo float-sum ordering, which the recall-style gates
  * tolerate), no sampling, no early exit.
  */
object HashedLogReg {

  final case class Model(dim: Int, weights: Array[Double], bias: Double,
                         losses: Array[Double])

  /** (idCol, label, idxs, vals) — hashed tf features. `labelCol` must
    * be 0/1.
    *
    * r12: packing is ROW-LOCAL — one JVM call hashes and counts a
    * document's tokens (xxhash64 = the same seed-42 XXH64 over UTF-8
    * bytes the expression computes) instead of the earlier
    * explode → groupBy(id, bucket) → groupBy(id) lineage, which paid a
    * token-grain explode and TWO corpus shuffles for a per-document
    * quantity (guide §2.4: adjacency/locality within a row never needed
    * a shuffle — the adjacentPairs lesson applied to bag-of-words).
    * Feature order within a doc was shuffle-dependent before and is
    * hash-map-dependent now; every consumer reduces over the pairs, so
    * the multiset contract is unchanged (HashedLogRegSpec pins it). */
  def featurize(df: DataFrame, textCol: String, labelExpr:
      org.apache.spark.sql.Column, idCol: String, dim: Int): DataFrame = {
    // fail fast on a null label (the API contract is 0/1): a silent
    // null would NPE deep inside an executor during training instead
    val label = when(labelExpr.cast("double").isNull,
      raise_error(lit(s"null label for a non-blank document " +
        s"(labelExpr must be 0/1)"))).otherwise(labelExpr.cast("double"))
    val d = dim.toLong
    val pack = udf { (ws: Seq[String]) =>
      val counts = new java.util.HashMap[Int, Long]()
      var n = 0L
      ws.foreach { w =>
        if (w.nonEmpty) {
          val b = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(b,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
              b.length, 42L)
          counts.merge((((h % d) + d) % d).toInt, 1L, (a, c) => a + c)
          n += 1
        }
      }
      val idxs = new Array[Int](counts.size)
      val vals = new Array[Double](counts.size)
      var i = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        idxs(i) = e.getKey
        vals(i) = e.getValue.toDouble / n
        i += 1
      }
      (idxs, vals)
    }
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), label.as("_y"),
        // the SAME trim/lower/split expression unigrams uses, so the
        // tokenization cannot diverge from the rest of the corpus stack
        pack(split(trim(lower(col(textCol))), "\\s+")).as("_p"))
      .select(col(idCol), col("_y"),
        col("_p._1").as("_idxs"), col("_p._2").as("_vals"))
  }

  /** Train on a featurized frame (from [[featurize]]). Returns the
    * model plus the per-iteration mean log-loss trace.
    *
    * Each iteration is ONE shuffle-free `aggregate` over the cached
    * feature RDD — the classic distributed-LR shape (MLlib's, minus
    * L-BFGS): every partition folds its documents into a single dim+2
    * gradient array (feature grads, bias grad, loss) and the partials
    * merge on the driver; NO shuffle exists anywhere in the loop. The earlier
    * explode → groupBy formulation was measured 5× slower at sf0.1
    * (16.8 s → 3.3 s, same session back-to-back):
    * 30 iterations × 2 stages × shuffle.partitions tasks of pure
    * launch overhead for KBs of gradient. RDD use here is the sanctioned
    * per-partition-imperative exception — the aggregation state is an
    * ARRAY indexed by feature, which no relational groupBy expresses
    * without manufacturing a row per (doc, feature). */
  def trainFeaturized(feats: DataFrame, dim: Int, iters: Int = 20,
                      lr: Double = 2.0): Model = {
    val cached = feats.select(col("_y"), col("_idxs"), col("_vals")).rdd
      .map(r => (r.getDouble(0), r.getSeq[Int](1).toArray,
        r.getSeq[Double](2).toArray))
      .persist()
    try {
      val n = cached.count().toDouble
      var w = new Array[Double](dim)
      var b = 0.0
      val losses = new Array[Double](iters)
      var it = 0
      while (it < iters) {
        val wNow = w; val bNow = b; val d = dim
        // plain aggregate, NOT treeAggregate: the tree level adds a
        // Kryo-serialized shuffle of the partials, which (a) is pure
        // overhead at dim ~1k (one array per partition merges fine on
        // the driver) and (b) crashes under a plain-java launch on
        // JDK 17 (Kryo needs --add-opens java.base/java.nio for its
        // relocation probe; sbt forks add it, the bench driver doesn't).
        // treeAggregate only pays when dim × partitions outgrows the
        // driver — rewire then.
        val acc = cached.aggregate(new Array[Double](d + 2))(
          (st, row) => {
            val (y, idxs, vals) = row
            var m = bNow; var i = 0
            while (i < idxs.length) { m += wNow(idxs(i)) * vals(i); i += 1 }
            val p = 1.0 / (1.0 + math.exp(-m))
            val r = p - y
            i = 0
            while (i < idxs.length) { st(idxs(i)) += r * vals(i); i += 1 }
            st(d) += r
            st(d + 1) -= y * math.log(math.max(p, 1e-12)) +
              (1.0 - y) * math.log(math.max(1.0 - p, 1e-12))
            st
          },
          (a, c) => { var i = 0; while (i < a.length) { a(i) += c(i); i += 1 }; a })
        losses(it) = acc(d + 1) / n
        val next = w.clone()
        var i = 0
        while (i < d) { next(i) -= lr * acc(i) / n; i += 1 }
        w = next
        b -= lr * acc(d) / n
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

  /** Score documents: (idCol, prob). EVERY input id gets a row —
    * blank/whitespace-only documents (which featurize's unigram pass
    * drops, having no tokens) score `sigmoid(bias)`, the model's
    * no-evidence prior, instead of silently vanishing from joins. */
  def score(df: DataFrame, textCol: String, idCol: String,
            model: Model): DataFrame = {
    val feats = featurize(df, textCol, F.lit(0), idCol, model.dim)
    val w = model.weights; val b = model.bias
    val probUdf = udf { (idxs: Seq[Int], vals: Seq[Double]) =>
      var m = b; var i = 0
      while (i < idxs.length) { m += w(idxs(i)) * vals(i); i += 1 }
      1.0 / (1.0 + math.exp(-m))
    }
    val scored = feats.select(col(idCol),
      probUdf(col("_idxs"), col("_vals")).as("prob"))
    val blanks = df.filter(length(trim(col(textCol))) === 0)
      .select(col(idCol),
        lit(1.0 / (1.0 + math.exp(-b))).as("prob"))
    scored.unionByName(blanks)
  }

  /** Scalar probability column — the SQL/Column form of [[score]] for
    * an ALREADY-TRAINED model whose weights ride a column (CROSS JOIN
    * a broadcast 1-row model frame — a scalar subquery won't do: Spark
    * rejects subquery expressions inside the higher-order-function
    * lambda the scorer folds with; registered as
    * `quality_prob(text, weights, bias)` in GraftFunctions). Same
    * featurization as [[featurize]] — xxhash64 mod `size(weights)`,
    * tf-normalized — folded per row with higher-order functions, so
    * scoring a 100 TB corpus is one shuffle-free codegen projection.
    * Identical margin to [[score]]: Σ_distinct w[i]·(c_i/n) over hashed
    * term frequencies equals Σ_tokens w[h(tok)]/n. Blank text scores
    * `sigmoid(bias)`, matching [[score]]'s empty-document contract. */
  def qualityProb(text: org.apache.spark.sql.Column,
                  weights: org.apache.spark.sql.Column,
                  bias: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val toksExpr = F.filter(split(trim(lower(text)), "\\s+"), w => w =!= "")
    // bind the token array once as a lambda variable (the
    // single-element transform idiom TextFunctions.bound uses)
    element_at(transform(array(toksExpr), { toks =>
      val margin = bias +
        aggregate(toks, lit(0.0d), (acc, w) =>
          acc + element_at(weights,
            (pmod(xxhash64(w), size(weights).cast("long")) + 1L)
              .cast("int"))) / size(toks)
      when(size(toks) === 0, lit(1.0d) / (lit(1.0d) + exp(-bias)))
        .otherwise(lit(1.0d) / (lit(1.0d) + exp(-margin)))
    }), 1)
  }
}
