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

  test("sub-graph row cap: auto-split repartitions; a skewed partition fails fast") {
    val (df, centers) = clustered(200, 2, 4, seed = 33)
    // everything in ONE partition, cap 50: autoSplit must spread it
    val dir = java.nio.file.Files.createTempDirectory("hnsw-cap").toString
    HnswIndex.writeGraphIndex(df.coalesce(1), "emb", "id", s"$dir/auto",
      maxPartitionRows = 50)
    val stored = spark.read.parquet(s"$dir/auto")
    assert(stored.count() >= 4, "auto-split should produce >= total/cap sub-graphs")
    import org.apache.spark.sql.functions.{max, sum}
    val (total, biggest) = stored
      .agg(sum(col("n_vectors")), max(col("n_vectors")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(total == 200 && biggest <= 50, s"total=$total biggest=$biggest")
    // and the split index still answers exactly at covering ef
    val got = HnswIndex.searchGraphIndex(spark, s"$dir/auto", "id",
      Seq(0L -> centers(0)), k = 10, HnswIndex.Params(efSearch = 1 << 20))
      .collect().map(_.getLong(1)).toSeq
    val exact = VectorFunctions.topK(df, "emb", "id", centers(0), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact)

    // autoSplit off + a single oversized partition: fail fast with the
    // repartition hint, not an OOM-sized binary cell
    val e = intercept[org.apache.spark.SparkException] {
      HnswIndex.writeGraphIndex(df.coalesce(1), "emb", "id", s"$dir/skew",
        maxPartitionRows = 50, autoSplit = false)
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg != null && msg.contains("Repartition the input"), msg)
  }

  test("build-time row cap persists with the index and bounds later adds") {
    val (all, _) = clustered(60, 2, 4, seed = 77)
    val base = all.filter(col("id") < 48)
    val dir = java.nio.file.Files.createTempDirectory("hnsw-meta").toString
    HnswIndex.writeGraphIndex(base, "emb", "id", s"$dir/idx",
      HnswIndex.Params(m = 6, efConstruction = 48), maxPartitionRows = 12)
    assert(HnswIndex.readMeta(spark, s"$dir/idx").contains((6, 48, 12)))

    // an add that would push one sub-graph past the STORED cap must fail
    // with the cap the index was built with, without the caller
    // re-passing it — repeated same-id batches pin ONE sub-graph (gid is
    // an id hash), so its stored cap deterministically trips
    val e = intercept[Exception] {
      (0 until 12).foreach { _ =>
        HnswIndex.addToGraphIndex(spark, s"$dir/idx",
          all.filter(col("id") === 48), "emb", "id")
      }
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg != null && msg.contains("12"), s"stored cap not enforced: $msg")
  }

  test("incremental add-batch == full index over the union (search results)") {
    val (all, centers) = clustered(300, 3, 8, seed = 44)
    val base = all.filter(col("id") < 200)
    val batch = all.filter(col("id") >= 200)
    val dir = java.nio.file.Files.createTempDirectory("hnsw-incr").toString

    HnswIndex.writeGraphIndex(base.repartition(4), "emb", "id", s"$dir/idx")
    HnswIndex.addToGraphIndex(spark, s"$dir/idx", batch, "emb", "id")

    // no vector lost or duplicated
    import org.apache.spark.sql.functions.sum
    val total = spark.read.parquet(s"$dir/idx")
      .agg(sum(col("n_vectors"))).collect().head.getLong(0)
    assert(total == 300, s"expected 300 vectors after add, got $total")

    // covering ef ⇒ exact ⇒ must equal brute force over base ∪ batch
    val queries = centers.indices.map(i => i.toLong -> centers(i))
    val got = HnswIndex.searchGraphIndex(spark, s"$dir/idx", "id",
        queries, k = 15, HnswIndex.Params(efSearch = 1 << 20))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = queries.flatMap { case (qid, q) =>
      VectorFunctions.topK(all, "emb", "id", q, 15)
        .collect().map(r => (qid, r.getLong(0))).toSeq
    }
    assert(got == exact)

    // approximate mode on the grown index still clears the recall floor
    val approx = HnswIndex.searchGraphIndex(spark, s"$dir/idx", "id",
        queries, k = 15, HnswIndex.Params(efSearch = 48))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = approx.intersect(exact.toSet).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall after incremental add fell to $recall")
  }

  test("incremental add rewrites ONLY the touched graph_id partitions") {
    val (all, _) = clustered(120, 2, 4, seed = 55)
    val base = all.filter(col("id") < 100)
    val dir = java.nio.file.Files.createTempDirectory("hnsw-touch").toString
    HnswIndex.writeGraphIndex(base.repartition(5), "emb", "id", s"$dir/idx")

    val before = spark.read.parquet(s"$dir/idx")
      .select(col("graph_id").cast("int"), col("n_vectors"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap

    // a 1-row batch touches exactly one sub-graph
    val batch = all.filter(col("id") === 100)
    HnswIndex.addToGraphIndex(spark, s"$dir/idx", batch, "emb", "id")

    val after = spark.read.parquet(s"$dir/idx")
      .select(col("graph_id").cast("int"), col("n_vectors"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(after.keySet == before.keySet)
    val changed = after.filter { case (gid, n) => before(gid) != n }
    assert(changed.size == 1 && changed.head._2 == before(changed.head._1) + 1,
      s"before=$before after=$after")
  }

  test("int8 at-rest graphs: self-describing blobs, near-float recall, " +
       "smaller store; incremental adds preserve the mode") {
    val (df, centers) = clustered(3000, 6, 32, seed = 21, spread = 1.0)
    val dirF = java.nio.file.Files
      .createTempDirectory("hnsw-sq8").toString + "/f"
    val dirQ = java.nio.file.Files
      .createTempDirectory("hnsw-sq8").toString + "/q"
    val p = HnswIndex.Params(m = 8, efConstruction = 64, efSearch = 64)
    HnswIndex.writeGraphIndex(df, "emb", "id", dirF, p)
    HnswIndex.writeGraphIndex(df, "emb", "id", dirQ, p, quantized = true)
    assert(!HnswIndex.readMetaQuantized(spark, dirF))
    assert(HnswIndex.readMetaQuantized(spark, dirQ))

    def ids(dir: String) = HnswIndex
      .searchGraphIndex(spark, dir, "id", Seq(0L -> centers(1)), k = 20, p)
      .collect().map(_.getLong(1)).toSet
    val recall = (ids(dirQ) intersect ids(dirF)).size.toDouble / 20
    info(f"graph sq8 recall vs float graphs: $recall%.2f")
    assert(recall >= 0.9)

    def dirBytes(d: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(d))
    }
    val (bf, bq) = (dirBytes(dirF), dirBytes(dirQ))
    info(f"at rest: float=$bf%d B sq8=$bq%d B ratio=${bq.toDouble / bf}%.2f")
    assert(bq * 2 < bf)

    // adds into a quantized index stay quantized (blob sentinel -2)
    // distinct jitter per row: exact-duplicate vectors (distance 0)
    // can leave a node unreachable under the diversity heuristic —
    // a real corpus property, not what this test is about
    val batch = (100000L until 100050L).map(i =>
      (i, centers((i % 6).toInt).zipWithIndex.map { case (x, j) =>
        x + 0.01f * ((i % 7) + 1) + 0.001f * j })).toDF("id", "emb")
    HnswIndex.addToGraphIndex(spark, dirQ, batch, "emb", "id", p)
    val blobs = spark.read.parquet(dirQ)
      .select("graph").collect().map(_.getAs[Array[Byte]](0))
    assert(blobs.forall { b =>
      java.nio.ByteBuffer.wrap(b, 0, 4).getInt == -2
    })
    // the adds landed (structural): stored row count grew by the batch
    assert(spark.read.parquet(dirQ)
      .selectExpr("sum(n_vectors)").head().getLong(0) == 3050L)
    // and the added points are probe-findable near their cluster
    val near = HnswIndex
      .searchGraphIndex(spark, dirQ, "id", Seq(0L -> centers(1)), k = 200,
        p.copy(efSearch = 512))
      .collect().map(_.getLong(1)).toSet
    assert(near.exists(_ >= 100000L), "no added id surfaced in the probe")
  }

  test("resident graph cache: identical blobs share one instance; " +
       "changed blobs miss; explicit ef overrides construction params") {
    val (df, centers) = clustered(400, 4, 8, seed = 11)
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val g = new HnswIndex.Hnsw(0, HnswIndex.Params(m = 8, efConstruction = 64))
    rows.sortBy(_._1).foreach { case (id, v) => g.add(id, v) }
    val blob = g.serialize()
    // content-addressed: same bytes (even a fresh array) → same instance
    val a = HnswIndex.residentGraph(blob)
    val b = HnswIndex.residentGraph(blob.clone())
    assert(a eq b)
    // resident probe == the original builder instance, at any ef (the
    // serialize/loadFrom round-trip is behavior-preserving)
    for (ef <- Seq(16, 400)) {
      assert(a.search(centers(2), 10, ef) == g.search(centers(2), 10, ef))
    }
    // a mutated (re-serialized, different content) blob is a different
    // resident entry — stale graphs can never be served
    g.add(100000L, centers(0))
    val c = HnswIndex.residentGraph(g.serialize())
    assert(!(c eq a))
    assert(c.search(centers(0), 1, 400).head._1 == 100000L)
  }

  test("streaming incremental: foreachBatch grows the stored index batch by batch") {
    val (all, centers) = clustered(150, 2, 4, seed = 66)
    val base = all.filter(col("id") < 90)
    val dir = java.nio.file.Files.createTempDirectory("hnsw-stream").toString
    HnswIndex.writeGraphIndex(base.repartition(3), "emb", "id", s"$dir/idx")

    // arrivals as files (the repo's streaming-test transport), one
    // micro-batch per file via maxFilesPerTrigger
    all.filter(col("id") >= 90 && col("id") < 120).coalesce(1)
      .write.parquet(s"$dir/in/b1")
    all.filter(col("id") >= 120).coalesce(1).write.parquet(s"$dir/in/b2")
    val stream = spark.readStream
      .schema("id LONG, emb ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/in/*")
    val q = stream.writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        HnswIndex.addToGraphIndex(spark, s"$dir/idx", b, "emb", "id")
        ()
      }.start()
    q.processAllAvailable(); q.stop()

    import org.apache.spark.sql.functions.sum
    val total = spark.read.parquet(s"$dir/idx")
      .agg(sum(col("n_vectors"))).collect().head.getLong(0)
    assert(total == 150, s"streamed index holds $total of 150")
    val got = HnswIndex.searchGraphIndex(spark, s"$dir/idx", "id",
        Seq(0L -> centers(0)), k = 12, HnswIndex.Params(efSearch = 1 << 20))
      .collect().map(_.getLong(1)).toSeq
    val exact = VectorFunctions.topK(all, "emb", "id", centers(0), 12)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }

  test("maintenance: recall decays as capped sub-graphs fill with adds; " +
       "re-split repairs it to the floor (family maintenance contract)") {
    // UNstructured data at a deliberately weak graph (small m/efC) and a
    // fixed serve-time efSearch — the regime where an ef-bounded walk's
    // covered fraction, and recall, shrink as the sub-graph fills
    val rng = new scala.util.Random(77)
    val dim = 16
    def mk(n: Int, off: Long) = (0 until n).map { i =>
      (off + i, Array.fill(dim)(rng.nextGaussian().toFloat))
    }.toDF("id", "emb")
    val base = mk(500, 0)
    val dir = java.nio.file.Files.createTempDirectory("hnsw-maint").toString
    val p = HnswIndex.Params(m = 4, efConstruction = 16, efSearch = 32)
    HnswIndex.writeGraphIndex(base.repartition(1), "emb", "id",
      s"$dir/idx", p, maxPartitionRows = 100000)
    val adds = mk(5500, 1000000L)
    HnswIndex.addToGraphIndex(spark, s"$dir/idx", adds, "emb", "id", p)
    val all = base.unionByName(adds).cache()
    all.count()

    val degraded = HnswIndex.graphIndexRecall(spark, s"$dir/idx", all,
      "emb", "id", nQueries = 5, k = 20, p)
    info(f"degraded recall: $degraded%.3f")
    assert(degraded < 0.95,
      s"expected the filled sub-graph to degrade below the floor, " +
        s"measured $degraded")

    val (repaired, rebuilt) = HnswIndex.maintainGraphIndex(spark,
      s"$dir/idx", all, "emb", "id", recallFloor = 0.95,
      nQueries = 5, k = 20, params = p, maxRounds = 6)
    info(f"repaired recall: $repaired%.3f (rebuilt=$rebuilt)")
    assert(rebuilt, "degraded index must trigger a rebuild")
    assert(repaired >= 0.95, s"repair stopped below the floor: $repaired")

    // repaired index still holds every vector, in more, smaller graphs
    import org.apache.spark.sql.functions.sum
    val stored = spark.read.parquet(s"$dir/idx")
    assert(stored.agg(sum(col("n_vectors"))).head().getLong(0) == 6000L)
    assert(stored.count() > 1, "repair must have re-split the sub-graph")

    // healthy index: maintenance is a no-op
    val (r2, again) = HnswIndex.maintainGraphIndex(spark, s"$dir/idx",
      all, "emb", "id", recallFloor = 0.95, nQueries = 5, k = 20,
      params = p, maxRounds = 6)
    assert(!again && r2 >= 0.95, s"healthy index re-rebuilt (recall $r2)")
    all.unpersist()
  }
}
