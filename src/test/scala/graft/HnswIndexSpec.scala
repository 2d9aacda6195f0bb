package graft

import graft.vector.{HnswIndex, VectorFunctions}
import org.apache.spark.sql.functions.col

class HnswIndexSpec extends SparkSpec {
  import spark.implicits._

  private def clustered(n: Int, nCenters: Int, dim: Int, seed: Int,
                        spread: Double = 0.3) = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(nCenters)(Array.fill(dim)(rng.nextGaussian().toFloat * 4))
    val df = (0 until n).map { i =>
      val c = centers(i % nCenters)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * spread).toFloat))
    }.toDF("id", "emb")
    (df, centers)
  }

  test("exact on a single partition when ef covers the corpus") {
    // with efSearch >= n the layer-0 sweep degenerates to exhaustive
    // search: HNSW must equal brute-force top-k exactly, scores included
    val (df, centers) = clustered(300, 4, 8, seed = 5)
    val one = df.coalesce(1)
    val got = HnswIndex.searchTopK(one, "emb", "id", centers(1), k = 10,
      HnswIndex.Params(m = 8, efConstruction = 300, efSearch = 300))
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)))
    val want = VectorFunctions.topK(one, "emb", "id", centers(1), 10)
      .collect().map(r => (r.getLong(0), BigDecimal(r.getDouble(1))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)))
    assert(got.toSeq == want.toSeq)
  }

  test("recall >= 0.9 on clustered data across partitions at serve params") {
    val (df, centers) = clustered(4000, 8, 16, seed = 9)
    val data = df.repartition(8).cache()
    data.count()
    val recalls = centers.take(4).map { q =>
      val ann = HnswIndex.searchTopK(data, "emb", "id", q, k = 20)
        .collect().map(_.getLong(0)).toSet
      val exact = VectorFunctions.topK(data, "emb", "id", q, 20)
        .collect().map(_.getLong(0)).toSet
      (ann intersect exact).size.toDouble / exact.size
    }
    data.unpersist()
    val recall = recalls.sum / recalls.length
    assert(recall >= 0.9, s"recall@20 fell to $recall (floor 0.9)")
  }

  test("deterministic: same content, same partitioning, same answer") {
    val (df, centers) = clustered(1000, 4, 8, seed = 13)
    val data = df.repartition(4, col("id")).cache()
    data.count()
    val a = HnswIndex.searchTopK(data, "emb", "id", centers(2), k = 15).collect().toSeq
    val b = HnswIndex.searchTopK(data, "emb", "id", centers(2), k = 15).collect().toSeq
    data.unpersist()
    assert(a == b)
  }

  test("multi-query probe: one build per partition serves every query") {
    val (df, centers) = clustered(1500, 6, 12, seed = 17)
    val data = df.repartition(4).cache()
    data.count()
    val queries = centers.take(3).zipWithIndex.map { case (q, i) => (i.toLong, q) }.toSeq
    val many = HnswIndex.searchTopKMany(data, "emb", "id", queries, k = 10)
      .collect().groupBy(_.getLong(0))
    queries.foreach { case (qid, q) =>
      val single = HnswIndex.searchTopK(data, "emb", "id", q, k = 10)
        .collect().map(_.getLong(0)).toSeq
      assert(many(qid).map(_.getLong(1)).toSeq == single,
        s"multi-query answer for query $qid diverges from single-query")
    }
    data.unpersist()
  }

  test("at-rest graph index: stored sub-graphs answer identically to " +
       "the in-memory build, with efSearch still a probe-time knob") {
    val (df, centers) = clustered(1200, 5, 12, seed = 29)
    val data = df.repartition(4, col("id")).cache()
    data.count()
    val dir = java.nio.file.Files.createTempDirectory("hnsw-idx").toString + "/graphs"
    HnswIndex.writeGraphIndex(data, "emb", "id", dir)
    val queries = centers.take(3).zipWithIndex.map { case (q, i) => (i.toLong, q) }.toSeq

    // identical ranked answers: the stored graphs ARE the in-memory
    // graphs (same content, same partitioning, deterministic build)
    val stored = HnswIndex.searchGraphIndex(spark, dir, "id", queries, k = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val live = HnswIndex.searchTopKMany(data, "emb", "id", queries, k = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(stored == live)

    // a wider probe beam on the SAME stored graphs: still deterministic,
    // recall can only stay or improve vs brute force
    val wide = HnswIndex.searchGraphIndex(spark, dir, "id", queries, k = 12,
      HnswIndex.Params(efSearch = 300))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = queries.map { case (qid, q) =>
      VectorFunctions.topK(data, "emb", "id", q, 12)
        .collect().map(r => (qid, r.getLong(0))).toSeq
    }.reduce(_ ++ _)
    assert(wide.toSet.intersect(exact.toSet).size >=
      stored.toSet.intersect(exact.toSet).size)
    data.unpersist()
  }

  test("empty and sub-k partitions are handled") {
    val (df, centers) = clustered(7, 2, 4, seed = 21)
    // 16 partitions, most empty; k larger than the corpus
    val got = HnswIndex.searchTopK(df.repartition(16), "emb", "id",
      centers(0), k = 20)
    assert(got.count() == 7)
  }
}
