package graft

import graft.ingest.{Cdx, Warc}
import graft.sources.WarcArchive
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The CDX-indexed archive connector: pushdown prunes the sidecar,
  * seeks are ranged, metadata queries never open a shard. */
class WarcArchiveSpec extends SparkSpec {

  private def rec(id: Long, uri: String, body: String): Array[Byte] =
    Warc.writeRecord(id, uri, body.getBytes("UTF-8"))

  /** Build a 3-shard archive: site1 pages in shard a, site2 pages in
    * shard b, a mixed shard c; then build the sidecar. */
  private def buildArchive(): String = {
    val dir = Files.createTempDirectory("graft-warc-archive").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/shards"))
    def write(name: String, blob: Array[Byte]): Unit =
      Files.write(java.nio.file.Paths.get(s"$dir/shards/$name"), blob)
    write("a.warc",
      rec(1L, "http://site1.example.com/p/1", "s1 p1") ++
        rec(2L, "http://site1.example.com/p/2", "s1 p2"))
    write("b.warc",
      rec(3L, "http://site2.example.com/p/1", "s2 p1") ++
        rec(4L, "http://site2.example.com/p/2", "s2 p2"))
    write("c.warc",
      rec(5L, "http://site1.example.com/p/3", "s1 p3") ++
        rec(6L, "http://site3.example.com/x", "s3 x"))
    WarcArchive.indexShards(spark, dir)
    dir
  }

  private def load(dir: String): DataFrame =
    spark.read.format("graft.sources.WarcArchiveSource")
      .option("path", dir).load()

  test("full scan (no predicate) equals the member-level truth") {
    val dir = buildArchive()
    val got = load(dir)
      .select(col("id"), col("urlkey"), col("digest"),
        expr("cast(payload AS STRING)").as("body"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
    assert(got.length == 6)
    assert(got(0) == ((1L, "com,example,site1)/p/1",
      Cdx.md5hex("s1 p1".getBytes("UTF-8")), "s1 p1")))
    assert(got(5)._2 == "com,example,site3)/x" && got(5)._4 == "s3 x")
  }

  test("urlkey equality seeks ONE member in ONE shard; plan shows the push") {
    val dir = buildArchive()
    val q = load(dir).filter(col("urlkey") === "com,example,site1)/p/3")
      .select(col("id"), expr("cast(payload AS STRING)").as("body"))
    // the filter reached the connector
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(urlkey,") ||
      plan.contains("pushedFilters"), plan)
    WarcArchive.filesOpened.set(0L)
    val rows = q.collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((5L, "s1 p3")))
    // only shard c was opened (the matching member lives there)
    assert(WarcArchive.filesOpened.get() == 1L)
  }

  test("urlkey prefix scans a site section across shards") {
    val dir = buildArchive()
    val q = load(dir)
      .filter(col("urlkey").startsWith("com,example,site1)"))
      .select(col("id"), expr("cast(payload AS STRING)").as("body"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(urlkey,") ||
      plan.contains("pushedFilters"), plan)
    WarcArchive.filesOpened.set(0L)
    // no orderBy before collect: a range-partitioned sort would run a
    // sampling job that re-executes the scan and double-counts opens
    val got = q.collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "s1 p1"), (2L, "s1 p2"), (5L, "s1 p3")))
    assert(WarcArchive.filesOpened.get() == 2L) // shards a and c only
  }

  test("metadata-only selective query opens NO shard file") {
    val dir = buildArchive()
    WarcArchive.filesOpened.set(0L)
    val got = load(dir)
      .filter(col("urlkey").startsWith("com,example,site2)"))
      .select(col("id"), col("digest"), col("rec_len"))
      .orderBy("id").collect()
    assert(got.length == 2 && got.map(_.getLong(0)).toSeq == Seq(3L, 4L))
    assert(WarcArchive.filesOpened.get() == 0L)
  }

  test("residual predicates still apply on top of the pushed ones") {
    val dir = buildArchive()
    val want = Cdx.md5hex("s1 p2".getBytes("UTF-8"))
    val got = load(dir)
      .filter(col("urlkey").startsWith("com,example,site1)") &&
        col("digest") === want) // digest is NOT pushable
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L))
  }

  test("a stale extent quarantines the row instead of misframing") {
    val dir = buildArchive()
    // corrupt the sidecar: point member 5's extent past shard c's end
    val cdx = WarcArchive.cdx(spark, dir)
      .withColumn("rec_offset",
        when(col("id") === 5L, lit(1000000L)).otherwise(col("rec_offset")))
    cdx.write.mode("overwrite").parquet(s"$dir/cdx_tmp")
    // replace atomically enough for a test
    val p = java.nio.file.Paths.get(s"$dir/cdx")
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
    org.apache.commons.io.FileUtils.moveDirectory(
      java.nio.file.Paths.get(s"$dir/cdx_tmp").toFile, p.toFile)
    val got = load(dir)
      .filter(col("urlkey").startsWith("com,example,site1)"))
      .select(col("id"), expr("cast(payload AS STRING)").as("body"))
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L)) // member 5 dropped, not garbage
  }

  test("COUNT(*) pushes to the sidecar: no shard opened, no row planned") {
    val dir = buildArchive()
    WarcArchive.filesOpened.set(0L)
    val section = load(dir)
      .filter(col("urlkey").startsWith("com,example,site1)"))
    assert(section.count() == 3L)
    assert(load(dir).count() == 6L)
    assert(WarcArchive.filesOpened.get() == 0L)
    // the aggregate reached the connector (complete pushdown)
    val agg = section.groupBy().count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("graft-warc-archive-agg") ||
      plan.contains("pushedAggregates"), plan)
    // a residual (non-pushable) filter refuses the sidecar count and
    // still answers correctly through the row path
    val resid = load(dir).filter(col("digest") ===
      Cdx.md5hex("s1 p2".getBytes("UTF-8"))).count()
    assert(resid == 1L)
  }

  test("repack keeps latest-per-urlkey, drops tombstones, and is idempotent") {
    import org.apache.spark.sql.Row
    val dir = buildArchive()
    // add a newer capture of site1/p/1 (id 10) and tombstone site3/x
    val extra = rec(10L, "http://site1.example.com/p/1", "s1 p1 NEW")
    Files.write(java.nio.file.Paths.get(s"$dir/shards/d.warc"), extra)
    WarcArchive.indexShards(spark, dir)
    val tomb = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("com,example,site3)/x"))),
      new org.apache.spark.sql.types.StructType().add("urlkey", "string"))
    val dst = Files.createTempDirectory("graft-repack-dst").toString
    val shardOf = lit(0L) // single destination shard
    WarcArchive.repack(spark, dir, dst, shardOf, Some(tomb))
    val got = WarcArchive.cdx(spark, dst)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("urlkey"),
        r.getAs[String]("digest"))).toSeq
    // 6 members - site3/x (tombstoned) - old site1/p/1 (superseded) = 5
    assert(got.map(_._1) == Seq(2L, 3L, 4L, 5L, 10L), got)
    assert(got.last._3 == Cdx.md5hex("s1 p1 NEW".getBytes("UTF-8")))
    assert(!got.exists(_._2 == "com,example,site3)/x"))
    // idempotence: repacking the repacked archive is byte-identical
    val dst2 = Files.createTempDirectory("graft-repack-dst2").toString
    WarcArchive.repack(spark, dst, dst2, shardOf, None)
    val b1 = Files.readAllBytes(
      java.nio.file.Paths.get(s"$dst/shards/shard-0000.warc"))
    val b2 = Files.readAllBytes(
      java.nio.file.Paths.get(s"$dst2/shards/shard-0000.warc"))
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("indexShards sidecar equals Cdx.index over each shard") {
    val dir = buildArchive()
    val got = WarcArchive.cdx(spark, dir)
      .orderBy("id")
      .collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("id"),
        r.getAs[String]("urlkey"), r.getAs[Long]("rec_offset"),
        r.getAs[Long]("rec_len"), r.getAs[String]("digest"))).toSeq
    val want = Seq("a.warc", "b.warc", "c.warc").flatMap { f =>
      val blob = Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/shards/$f"))
      Cdx.index(blob).map(e =>
        (f, e.id, e.urlkey, e.offset, e.length, e.digest))
    }.sortBy(_._2)
    assert(got == want)
  }
}
