package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary profiling harness for the routed-HNSW warm-probe constant. */
object RoutedProbeDebug extends App {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", 32)
    .config("spark.driver.memory", "16g")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val d = "/root/testdata/sf0.1"
  val tmp = java.nio.file.Files.createTempDirectory("rpd").toString
  val emb = spark.read.parquet(s"$d/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  val OFF = 100000000L
  val perturb = udf { (v: Seq[Float], id: Long, c: Long) =>
    val out = new Array[Float](v.length)
    var i = 0
    while (i < v.length) {
      val h = graft.text.RollingHash.hashToken(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"$c:$id:$i"))
      out(i) = v(i) + (((h % 1000L + 1000L) % 1000L) / 1000.0f - 0.5f) * 0.02f
      i += 1
    }
    out
  }
  val copies = if (args.nonEmpty) args(0).toInt else 500
  val corpus = emb
    .crossJoin(spark.range(copies).select(col("id").as("_copy")))
    .select((col("vec_id") + col("_copy") * OFF).as("vec_id"),
      perturb(col("embedding"), col("vec_id"), col("_copy")).as("embedding"))
    .repartition(32)
  corpus.write.mode("overwrite").parquet(s"$tmp/base")
  val base = spark.read.parquet(s"$tmp/base")
  println("corpus rows: " + base.count())
  val cs = graft.vector.IvfIndex.centroids(base, "embedding", "vec_id", 16)
  val p = graft.vector.HnswIndex.Params(m = 8, efConstruction = 32, efSearch = 256)
  val t0 = System.nanoTime()
  graft.vector.RoutedHnsw.writeRoutedIndex(base, "embedding", "vec_id",
    s"$tmp/f", cs, p)
  println(f"index build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
  val q = emb.filter(col("vec_id") === 0)
    .select(col("embedding")).head().getSeq[Float](0).toArray

  def time[T](label: String)(f: => T): T = {
    val t = System.nanoTime(); val r = f
    println(f"$label: ${(System.nanoTime() - t) / 1e9}%.3f s"); r
  }
  // cell layout
  spark.read.parquet(s"$tmp/f")
    .groupBy("centroid_id").agg(count(lit(1)).as("n_graphs"),
      sum(length(col("graph"))).as("bytes"))
    .orderBy("centroid_id").show(20)

  for (i <- 1 to 4) time(s"probe $i") {
    graft.vector.RoutedHnsw.search(spark, s"$tmp/f", "vec_id", cs, q,
      k = 20, nProbe = 4, p).collect()
  }
  // decompose: bytes-only scan of routed cells
  val cells = graft.vector.RoutedHnsw.routeCells(cs, q, 4)
  for (i <- 1 to 3) time(s"bytes scan $i") {
    spark.read.parquet(s"$tmp/f")
      .filter(col("centroid_id").isin(cells.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("centroid_id").cast("int"), col("graph"))
      .mapPartitions { it =>
        it.map { r => r.getAs[Array[Byte]](1).length.toLong }
      }(org.apache.spark.sql.Encoders.scalaLong).collect().sum
  }
  // hash cost on top
  for (i <- 1 to 3) time(s"bytes+hash scan $i") {
    spark.read.parquet(s"$tmp/f")
      .filter(col("centroid_id").isin(cells.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("centroid_id").cast("int"), col("graph"))
      .mapPartitions { it =>
        it.map { r =>
          val b = r.getAs[Array[Byte]](1)
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(b,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
        }
      }(org.apache.spark.sql.Encoders.scalaLong).collect().sum
  }
  // resident probe only (graph already cached): time search on cached graphs
  for (i <- 1 to 3) time(s"resident walk $i") {
    spark.read.parquet(s"$tmp/f")
      .filter(col("centroid_id").isin(cells.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("centroid_id").cast("int"), col("graph"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val g = graft.vector.HnswIndex.residentGraph(r.getAs[Array[Byte]](1))
          g.search(q, 20, 256).iterator.map(_._2)
        }
      }(org.apache.spark.sql.Encoders.scalaDouble).collect().length
  }
  // manifest-only scan (what the warm fast path reads)
  for (i <- 1 to 3) time(s"manifest scan $i") {
    spark.read.parquet(s"$tmp/f")
      .filter(col("centroid_id").isin(cells.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("centroid_id").cast("int"), col("seg_hash"),
        input_file_name().as("_file"))
      .collect().length
  }
  // reusing ONE pre-listed DataFrame across probes (amortized listing)
  val preread = spark.read.parquet(s"$tmp/f")
  for (i <- 1 to 3) time(s"manifest scan prelisted $i") {
    preread
      .filter(col("centroid_id").isin(cells.map(Integer.valueOf).toIndexedSeq: _*))
      .select(col("centroid_id").cast("int"), col("seg_hash"),
        input_file_name().as("_file"))
      .collect().length
  }
  // brute force comparison
  for (i <- 1 to 3) time(s"brute $i") {
    graft.vector.VectorFunctions.topK(base, "embedding", "vec_id", q, 20).collect()
  }
  println("tmp=" + tmp)
  spark.stop()
}
