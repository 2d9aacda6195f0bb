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

  test("codec round-trips arbitrary strings (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      (8, Gen.asciiPrintableChar),
      (2, Gen.oneOf('\t', '\n', '\\', '"', 'é', '中')))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    (0 until 300).foreach { i =>
      val params = Gen.Parameters.default
      val k = strGen.apply(params, Seed(i.toLong)).getOrElse("k")
      val v = strGen.apply(params, Seed(1000L + i)).getOrElse("v")
      val (dk, dv, dt) = KvCacheSink.decode(KvCacheSink.encode(k, v, i.toLong))
      assert(dk == k && dv == v && dt == i.toLong,
        s"k=${k.take(40)} v=${v.take(40)}")
    }
  }

  test("2-phase commit: an aborted task's file never reaches the live dir, " +
       "and an unreported staged file is discarded at commit") {
    import graft.sources.{KvCommit, KvWrite, KvWriterFactory}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val dir = java.nio.file.Files.createTempDirectory("kv-abort").toString
    val write = new KvWrite(dir, "q-test", truncate = false)
    val factory = write.toBatch
      .createBatchWriterFactory(null).asInstanceOf[KvWriterFactory]

    def row(k: String, ttl: Long) = {
      val r = new GenericInternalRow(3)
      r.update(0, UTF8String.fromString(k)); r.update(1, null)
      r.update(2, ttl); r
    }
    // task 0 commits; task 1 aborts mid-write; task 2 writes but its
    // message is lost (speculative duplicate) — never reported
    val w0 = factory.createWriter(0, 100L)
    w0.write(row("committed", 1L))
    val m0 = w0.commit()
    val w1 = factory.createWriter(1, 101L)
    w1.write(row("aborted", 2L)); w1.abort()
    val w2 = factory.createWriter(2, 102L)
    w2.write(row("unreported", 3L)); w2.commit() // message dropped below
    write.commit(Array(m0))

    val keys = spark.read.format(fmt).option("path", dir).load()
      .collect().map(_.getString(0)).toSeq
    assert(keys == Seq("committed"))
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".staging")))
  }

  test("failure injection: a task crash mid-job leaves the previous " +
       "snapshot fully visible and no staging residue") {
    val dir = java.nio.file.Files.createTempDirectory("kv-fail").toString
    sample.write.format(fmt).option("path", dir).mode("overwrite").save()
    // a poisoned row: ANSI raise_error fires while TASKS are writing,
    // failing the job after some partitions have staged their files
    val poisoned = sample.repartition(3).withColumn("ttl_s",
      when(col("cache_key") === "events:2024-01-02",
        raise_error(lit("injected task failure")).cast("long"))
        .otherwise(col("ttl_s")))
    intercept[Exception] {
      poisoned.write.format(fmt).option("path", dir).mode("overwrite").save()
    }
    // readers see snapshot A untouched — overwrite semantics must not
    // leak from a failed job (truncation happens only at commit)
    val back = spark.read.format(fmt).option("path", dir).load()
    assert(back.orderBy("cache_key").collect().toSeq ==
      sample.orderBy("cache_key").collect().toSeq)
    // and the aborted write's staging dir is gone
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".staging")))
  }

  test("failure injection: a driver crash MID-COMMIT (after a partial " +
       "phase-A move) publishes nothing; the next commit GCs the orphan") {
    import graft.sources.{KvCommit, KvWrite, KvWriterFactory}
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val dir = java.nio.file.Files.createTempDirectory("kv-crash").toString
    sample.write.format(fmt).option("path", dir).mode("overwrite").save()

    val write = new KvWrite(dir, "q-crash", truncate = true)
    val factory = write.toBatch
      .createBatchWriterFactory(null).asInstanceOf[KvWriterFactory]
    val w0 = factory.createWriter(0, 500L)
    val r = new GenericInternalRow(3)
    r.update(0, UTF8String.fromString("half-committed")); r.update(1, null)
    r.update(2, 9L)
    w0.write(r)
    val m0 = w0.commit()
    // the commit moves m0's staged file into the live dir, then dies on
    // the second (nonexistent) message — BEFORE the manifest flip
    intercept[Exception] {
      write.commit(Array(m0, KvCommit(s"$dir/.staging-q-crash/ghost.kv")))
    }
    // the moved file is physically present but REFERENCED BY NOTHING:
    // readers still resolve snapshot A in full, no partial payload
    val orphan = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.contains("q-crash"))
    assert(orphan.length == 1, "phase-A move should have happened")
    val keys = spark.read.format(fmt).option("path", dir).load()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(keys == sample.collect().map(_.getString(0)).sorted.toSeq)
    assert(!keys.contains("half-committed"))
    // a subsequent successful overwrite garbage-collects the orphan file
    // (the crashed query's staging DIR is inert residue — only its own
    // writer would clean it, and it never references live data)
    sample.write.format(fmt).option("path", dir).mode("overwrite").save()
    assert(!new java.io.File(dir).listFiles()
      .exists(f => f.isFile && f.getName.contains("q-crash")))
    assert(spark.read.format(fmt).option("path", dir).load().count() == 3)
  }

  test("SETEX expiry at read: option(now) hides rows past write+ttl, " +
       "per-row by tier (C5/S8)") {
    val dir = java.nio.file.Files.createTempDirectory("kv").toString
    sample.write.format(fmt).option("path", dir).mode("overwrite").save()
    val writtenAt = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".kv")).map(_.lastModified() / 1000L).max

    def liveAt(now: Long): Seq[String] =
      spark.read.format(fmt).option("path", dir)
        .option("now", now.toString).load()
        .collect().map(_.getString(0)).toSeq.sorted

    // before any ttl elapses: all three keys live (and no `now` = no expiry)
    assert(liveAt(writtenAt) ==
      Seq("events:2024-01-01", "events:2024-01-02", "events:2024-01-03"))
    assert(spark.read.format(fmt).option("path", dir).load().count() == 3)
    // 1h tier expires first, 12h next, 24h last — per-row, same file
    assert(liveAt(writtenAt + 3600) ==
      Seq("events:2024-01-02", "events:2024-01-03"))
    assert(liveAt(writtenAt + 43200) == Seq("events:2024-01-03"))
    assert(liveAt(writtenAt + 86400).isEmpty)
  }
}
