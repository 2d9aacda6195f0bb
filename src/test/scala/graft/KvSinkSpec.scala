package graft

import graft.sources.KvCacheSink
import org.apache.spark.sql.functions._

class KvSinkSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.KvCacheSink"

  private def sample = Seq(
    ("events:2024-01-01", """[{"id":1}]""", 3600L),
    ("events:2024-01-02", """[{"id":2},{"id":3}]""", 43200L),
    ("events:2024-01-03", null.asInstanceOf[String], 86400L))
    .toDF("cache_key", "payload_json", "ttl_s")

  test("S7 write + S6 read round-trip across partitions") {
    val dir = java.nio.file.Files.createTempDirectory("kv").toString
    sample.repartition(3).write.format(fmt).option("path", dir)
      .mode("overwrite").save()
    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.orderBy("cache_key").collect().toSeq ==
      sample.orderBy("cache_key").collect().toSeq)
    // one live file per partition, no staging leftovers
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(files.count(_.endsWith(".kv")) == 3)
    assert(!files.exists(_.startsWith(".staging")), files.toString)
  }

  test("mode(overwrite) truncates (S8 invalidation); mode(append) adds") {
    val dir = java.nio.file.Files.createTempDirectory("kv").toString
    sample.write.format(fmt).option("path", dir).mode("overwrite").save()
    sample.write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(spark.read.format(fmt).option("path", dir).load().count() == 3)
    sample.write.format(fmt).option("path", dir).mode("append").save()
    assert(spark.read.format(fmt).option("path", dir).load().count() == 6)
  }

  test("payloads with tabs, newlines, backslashes round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("kv").toString
    val tricky = Seq(("k\t1", "a\tb\nc\\d", 60L), ("k2", "\\n not a newline", 61L))
      .toDF("cache_key", "payload_json", "ttl_s")
    tricky.write.format(fmt).option("path", dir).mode("overwrite").save()
    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.orderBy("ttl_s").collect().toSeq ==
      tricky.orderBy("ttl_s").collect().toSeq)
  }

  test("write resolves columns BY NAME: missing nullable column null-fills, " +
       "incompatible type is rejected at analysis") {
    val dir = java.nio.file.Files.createTempDirectory("kv").toString
    // payload_json absent -> filled with null (it is nullable)
    Seq(("k", 1L)).toDF("cache_key", "ttl_s")
      .write.format(fmt).option("path", dir).mode("overwrite").save()
    val row = spark.read.format(fmt).option("path", dir).load().head()
    assert(row.getString(0) == "k" && row.isNullAt(1) && row.getLong(2) == 1L)
    // ttl_s as string cannot safely cast to bigint under ANSI -> fails
    intercept[Exception] {
      Seq(("k", "p", "not-a-ttl")).toDF("cache_key", "payload_json", "ttl_s")
        .write.format(fmt).option("path", dir).mode("append").save()
    }
  }

  test("line codec: null marker distinct from literal backslash-zero") {
    assert(KvCacheSink.decode(KvCacheSink.encode("k", null, 1L))._2 == null)
    val lit = KvCacheSink.decode(KvCacheSink.encode("k", "\\0", 1L))._2
    assert(lit == "\\0")
  }
}
