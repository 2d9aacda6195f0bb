package graft

import graft.plans.SaltedJoin
import graft.store.BucketedStore
import org.apache.spark.sql.functions._

class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans with no shuffle Exchange") {
    val a = (1 to 2000).map(i => (i.toLong, s"a$i")).toDF("id", "va")
    val b = (1 to 2000).map(i => (i.toLong, s"b$i")).toDF("id", "vb")
    BucketedStore.saveBucketed(a, "bk_a", Seq("id"), buckets = 8)
    BucketedStore.saveBucketed(b, "bk_b", Seq("id"), buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected co-located join, plan was:\n$plan")
      assert(joined.count() == 2000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed mergeInto: upsert without shuffling the target") {
    val target = Seq((1L, "old"), (2L, "keep")).toDF("id", "v")
    BucketedStore.saveBucketed(target, "bk_t", Seq("id"), buckets = 4)
    val source = Seq((1L, "new"), (3L, "ins")).toDF("id", "v")
    val merged = BucketedStore.mergeInto(spark, "bk_t", source, Seq("id"),
      buckets = 4)
    val got = merged.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
    spark.sql("DROP TABLE IF EXISTS bk_t")
    spark.sql("DROP TABLE IF EXISTS bk_a")
    spark.sql("DROP TABLE IF EXISTS bk_b")
  }

  test("salted join equals plain join on skewed data") {
    val big = (1 to 5000).map(i =>
      (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (7L, "x")).toDF("k", "dim")
    val plain = big.join(small, "k")
    val salted = SaltedJoin.join(big, small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }

  test("two-phase salted aggregation equals direct groupBy") {
    val df = (1 to 5000).map(i => (if (i % 3 == 0) "hot" else s"k$i", i))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"))
    val salted = SaltedJoin.twoPhaseCount(df, Seq("k"))
    assert(salted.except(direct).count() == 0)
    assert(direct.except(salted).count() == 0)
  }

  test("date-partitioned layout: a date filter is PARTITION pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val df = Seq(
      (1L, "2024-01-01 10:00:00", "a"),
      (2L, "2024-01-02 11:00:00", "b"),
      (3L, "2024-01-02 12:00:00", "c"),
      (4L, "2024-01-03 13:00:00", "d"),
    ).toDF("id", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    BucketedStore.saveDatePartitioned(df, dir, "ts")
    val one = BucketedStore.readDate(spark, dir, "2024-01-02")
    // execute THIS plan so its scan metrics populate
    assert(one.collect().map(_.getAs[Long]("id")).sorted.toSeq == Seq(2L, 3L))
    // the predicate must land in PartitionFilters (file-listing time),
    // not PushedFilters (row time)
    val scan = one.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("p_date"), s"no partition filter in:\n$scan")
    // only the matching date directory's files are read (numFiles metric
    // of the executed scan; inputFiles would show the unpruned listing)
    val numFiles = one.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }
    assert(numFiles.contains(2L), s"numFiles=$numFiles")
  }

  test("dynamic partition overwrite replaces only the re-run date") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dyn").toString + "/t"
    val day1 = Seq(("2024-01-01 10:00:00", 1L), ("2024-01-01 11:00:00", 2L))
    val day2 = Seq(("2024-01-02 10:00:00", 3L))
    graft.store.BucketedStore.overwriteDatePartitions(
      (day1 ++ day2).toDF("ts", "v"), dir, "ts")
    assert(spark.read.parquet(dir).count() == 3)

    // re-run ONLY day 1 with corrected rows
    val rerun = Seq(("2024-01-01 10:00:00", 10L)).toDF("ts", "v")
    graft.store.BucketedStore.overwriteDatePartitions(rerun, dir, "ts")
    val after = spark.read.parquet(dir)
      .select(col("v"), col("p_date").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // day 1 fully replaced (both old rows gone), day 2 untouched
    assert(after == Set((10L, "2024-01-01"), (3L, "2024-01-02")), after.toString)
  }

  test("compact rewrites many small files into targetFiles, content intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/t"
    val df = (1 to 5000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    df.repartition(64).write.mode("overwrite").parquet(dir)
    def parquetFiles = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 64)
    graft.store.BucketedStore.compact(spark, dir, targetFiles = 4)
    assert(parquetFiles == 4, s"files after compact: $parquetFiles")
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == (1 to 5000).map(_.toLong).sum)
    // no staging/old leftovers
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.contains("compact-staging") || n.contains("compact-old")))
  }

  test("dynamic partition pruning: a filtered dim prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val fact = Seq(
      ("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0),
      ("2024-01-03", 3L, 30.0), ("2024-01-04", 4L, 40.0),
    ).toDF("day", "k", "v").withColumn("day", to_date(col("day")))
    BucketedStore.saveDatePartitioned(fact, dir, "day")
    // dim: only one qualifying date, discovered at RUNTIME through the
    // join (the fact filter is not static — DPP must inject it)
    // the dim must be a REAL scan: a filter over a local Seq is
    // constant-folded away (ConvertToLocalRelation) and the pruning rule
    // then sees no selective predicate on the build side
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("2024-01-02", "keep"), ("2024-01-03", "drop"))
      .toDF("d", "tag").withColumn("d", to_date(col("d")))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
    // KB-sized test tables fail DPP's benefit heuristic (benefit is
    // proportional to the partitioned scan's bytes); raise the fallback
    // ratio so the decision reflects the plan SHAPE, as it would at a
    // production fact-table size
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio",
      "10000.0")
    val joined = try {
      val j = spark.read.parquet(dir).join(dim, col("p_date") === col("d"))
      j.collect()
      j
    } finally {
      spark.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats")
      spark.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    }
    val rows = joined.collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("k") == 2L)
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a DynamicPruningExpression partition filter in:\n${plan.take(2000)}")
  }
}
