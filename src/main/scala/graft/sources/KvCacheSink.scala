package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSourceV2 KV-cache sink/source — the engine-native form of the
  * reference's Redis serving cache (SURVEY.md S7/S8,
  * `redis_cache.py:98-216`): rows of `(cache_key, payload_json, ttl_s)`.
  *
  *   df.write.format("graft.sources.KvCacheSink")
  *     .option("path", dir).mode("overwrite").save()
  *
  * The point of a real `SupportsWrite` connector (vs `foreachPartition`
  * with ad-hoc I/O) is the two-phase commit protocol that makes a
  * distributed KV flush exactly-once at 1000 executors:
  *
  *  - each task writes its partition to `.staging-<queryId>/part-…` and
  *    reports the file in its [[WriterCommitMessage]];
  *  - the DRIVER commits by moving exactly the reported files into the
  *    live directory and then flipping visibility with ONE atomic
  *    rename of a `MANIFEST` snapshot (the committed file list —
  *    truncation under `mode("overwrite")` is just a manifest that
  *    omits the old files, [[SupportsTruncate]], the cache-invalidation
  *    path S8). Readers resolve the live set through the manifest, so a
  *    driver crash ANYWHERE mid-commit leaves the previous snapshot
  *    fully visible and the new one fully invisible — no partial
  *    payloads, ever (KvSinkSpec injects the crash and proves it);
  *  - a failed/speculated task's file is never reported, and `abort`
  *    deletes the whole staging dir — half-written output is invisible.
  *  - files a crashed commit moved but never published are unreferenced
  *    garbage; the next `overwrite` commit deletes them.
  *
  * Line format: TSV with `\t`/`\n`/`\\` escaped, one row per line.
  */
class KvCacheSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvCacheSink.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"))
}

object KvCacheSink {
  val schema: StructType = StructType(Seq(
    StructField("cache_key", StringType, nullable = false),
    StructField("payload_json", StringType, nullable = true),
    StructField("ttl_s", LongType, nullable = false)))

  private[graft] def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  private[graft] def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case other => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private[graft] val NullMark = "\\0"

  private[graft] def encode(key: String, payload: String, ttl: Long): String =
    esc(key) + "\t" + (if (payload == null) NullMark else esc(payload)) +
      "\t" + ttl

  private[graft] def decode(line: String): (String, String, Long) = {
    val parts = line.split("\t", 3)
    require(parts.length == 3, s"malformed kv line: $line")
    (unesc(parts(0)),
      if (parts(1) == NullMark) null else unesc(parts(1)),
      parts(2).toLong)
  }

  private[sources] val ManifestName = "MANIFEST"

  /** The committed snapshot: the manifest's file list when one exists
    * (every commit publishes one), else the legacy directory listing
    * (dirs written before the manifest protocol / hand-built fixtures).
    * A manifest-referenced file that is missing surfaces as a read
    * error — that is corruption, not something to paper over. */
  private[sources] def liveFiles(path: String): Array[java.io.File] = {
    val manifest = new java.io.File(path, ManifestName)
    if (manifest.isFile)
      Files.readAllLines(manifest.toPath, UTF_8).asScala
        .filter(_.nonEmpty).map(n => new java.io.File(path, n))
        .toArray.sortBy((f: java.io.File) => f.getName)
    else
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".kv"))
        .sortBy(_.getName)
  }
}

class KvTable(path: String) extends Table with SupportsRead with SupportsWrite {
  require(path != null, "graft.sources.KvCacheSink requires option(\"path\", dir)")
  override def name(): String = s"kv_cache($path)"
  override def schema(): StructType = KvCacheSink.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(path,
      Option(options.get("now")).map(_.toLong))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val names = info.schema().fieldNames.toSeq
    require(names == KvCacheSink.schema.fieldNames.toSeq,
      s"kv_cache write schema must be ${KvCacheSink.schema.fieldNames.toSeq}, got $names")
    new KvWriteBuilder(path, info.queryId())
  }
}

// ---------------------------------------------------------------- read

/** `now` (epoch seconds), when set, applies the Redis SETEX expiry at
  * read time: a row is visible iff `write_time + ttl_s > now`, where the
  * write time is the committed file's mtime (set by the task's staging
  * write — commit's ATOMIC_MOVE preserves it). Expiry is evaluated
  * per-row in the reader (TTLs are tiered per key, C5), so an expired
  * key disappears exactly as it would from Redis without a compaction
  * pass over the live files. */
class KvScanBuilder(path: String, now: Option[Long]) extends ScanBuilder {
  override def build(): Scan = new KvScan(path, now)
}

class KvScan(path: String, now: Option[Long]) extends Scan with Batch {
  override def readSchema(): StructType = KvCacheSink.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv path=$path" + now.map(n => s" now=$n").getOrElse("")

  override def planInputPartitions(): Array[InputPartition] =
    KvCacheSink.liveFiles(path)
      .map(f => KvInputPartition(f.getAbsolutePath,
        f.lastModified() / 1000L): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new KvReaderFactory(now)
}

case class KvInputPartition(filePath: String,
                            writtenAtSec: Long) extends InputPartition

class KvReaderFactory(now: Option[Long]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvInputPartition]
    new PartitionReader[InternalRow] {
      private val lines = Files.readAllLines(Paths.get(p.filePath), UTF_8)
        .asScala.iterator
      private var current: (String, String, Long) = _
      private def live(row: (String, String, Long)): Boolean =
        now.forall(n => p.writtenAtSec + row._3 > n)
      override def next(): Boolean = {
        while (lines.hasNext) {
          current = KvCacheSink.decode(lines.next())
          if (live(current)) return true
        }
        false
      }
      override def get(): InternalRow = {
        val row = new GenericInternalRow(3)
        row.update(0, UTF8String.fromString(current._1))
        row.update(1,
          if (current._2 == null) null else UTF8String.fromString(current._2))
        row.update(2, current._3)
        row
      }
      override def close(): Unit = ()
    }
  }
}

// --------------------------------------------------------------- write

class KvWriteBuilder(path: String, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new KvWrite(path, queryId, doTruncate)
}

case class KvCommit(stagedFile: String) extends WriterCommitMessage

class KvWrite(path: String, queryId: String, truncate: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String =
    s"graft-kv-write path=$path truncate=$truncate"

  private def stagingDir: Path = Paths.get(path, s".staging-$queryId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(stagingDir)
    new KvWriterFactory(stagingDir.toString, queryId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val live = Paths.get(path)
    Files.createDirectories(live)
    // the files already published before this commit (manifest snapshot
    // or legacy listing) — kept under append, dropped under truncate
    val prior = KvCacheSink.liveFiles(path).map(_.getName)
    // phase A: move only files REPORTED by committed tasks into the live
    // dir; stragglers/speculative duplicates left in staging are
    // discarded. Moved files stay INVISIBLE until the manifest flips.
    val moved = messages.map { case KvCommit(staged) =>
      val src = Paths.get(staged)
      Files.move(src, live.resolve(src.getFileName),
        StandardCopyOption.ATOMIC_MOVE)
      src.getFileName.toString
    }
    // phase B: publish the new snapshot with ONE atomic rename. A crash
    // before this point leaves the previous manifest — and therefore the
    // previous fully-consistent state — in effect.
    val entries = (if (truncate) moved.toSeq else prior.toSeq ++ moved)
      .distinct.sorted
    val tmp = live.resolve(s".manifest-$queryId.tmp")
    Files.write(tmp, entries.mkString("\n").getBytes(UTF_8))
    Files.move(tmp, live.resolve(KvCacheSink.ManifestName),
      StandardCopyOption.ATOMIC_MOVE)
    // phase C: garbage-collect files the new snapshot no longer
    // references (truncated predecessors, orphans of crashed commits)
    val keep = entries.toSet
    Option(live.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".kv") && !keep(f.getName))
      .foreach(_.delete())
    cleanupStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging()

  private def cleanupStaging(): Unit = {
    val dir = stagingDir.toFile
    Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
    dir.delete()
  }
}

class KvWriterFactory(stagingDir: String, queryId: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(stagingDir, queryId, partitionId, taskId)
}

class KvDataWriter(stagingDir: String, queryId: String, partitionId: Int,
                   taskId: Long) extends DataWriter[InternalRow] {
  // taskId keeps concurrent attempts of one partition apart; queryId
  // makes the name unique ACROSS sessions (task ids restart per
  // SparkContext — an append from a fresh session must never collide
  // with, and silently replace, a live file from an old one)
  private val file =
    Paths.get(stagingDir, f"part-$partitionId%05d-$taskId-$queryId.kv")
  private val out = Files.newBufferedWriter(file, UTF_8)

  override def write(row: InternalRow): Unit = {
    val key = row.getUTF8String(0).toString
    val payload = if (row.isNullAt(1)) null else row.getUTF8String(1).toString
    out.write(KvCacheSink.encode(key, payload, row.getLong(2)))
    out.write("\n")
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    KvCommit(file.toString)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(file)
  }

  override def close(): Unit = ()
}
