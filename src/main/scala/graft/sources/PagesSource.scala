package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the extractor's fetch boundary (SURVEY.md
  * S1, `extractor/service.py:58-116`): a directory of fetched pages read
  * as `raw_pages(url, html, fetched_at)`.
  *
  *   spark.read.format("graft.sources.PagesSource")
  *     .option("path", dir).load()
  *
  * Each `<name>.html` file is one page; `url` is `/<name>` (the
  * reference keys pages by site-relative href), `fetched_at` is the file
  * mtime. The point of doing this as a DSv2 connector rather than
  * `spark.read.text` + UDFs is connector-level pushdown, which is what
  * makes a page-archive scan viable at 100 TB:
  *
  *  - **column pruning** ([[SupportsPushDownRequiredColumns]]): a query
  *    that never projects `html` (frontier counts, url audits) reads NO
  *    file bytes — the reader only stats metadata;
  *  - **filter pushdown** ([[SupportsPushDownFilters]]): `EqualTo` /
  *    `StringStartsWith` predicates on `url` prune the file list BEFORE
  *    any partition is planned, so a `/venues/%` crawl touches only
  *    venue pages.
  *
  * One file = one [[InputPartition]] (a production page archive batches
  * many pages per split; the planning/pruning path is identical).
  */
class PagesSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagesSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagesTable(properties.get("path"))
}

object PagesSource {
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("html", StringType, nullable = true),
    StructField("fetched_at", TimestampType, nullable = false)))

  private[sources] def urlOf(file: java.io.File): String =
    "/" + file.getName.stripSuffix(".html")
}

class PagesTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft.sources.PagesSource requires option(\"path\", dir)")
  override def name(): String = s"raw_pages($path)"
  override def schema(): StructType = PagesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(path)
}

class PagesScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = PagesSource.schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("url", _: String) => true
      case StringStartsWith("url", _) => true
      case _ => false
    }
    pushed = supported
    rest // residual filters Spark must still evaluate
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = {
    requiredSchema = required
  }

  override def build(): Scan =
    new PagesScan(path, requiredSchema, pushed)
}

class PagesScan(path: String, requiredSchema: StructType,
                pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pages path=$path, readSchema=[${requiredSchema.fieldNames.mkString(",")}], " +
      s"pushedFilters=[${pushed.mkString(",")}]"

  private def keep(url: String): Boolean = pushed.forall {
    case EqualTo("url", v: String) => url == v
    case StringStartsWith("url", p) => url.startsWith(p)
    case _ => true
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".html"))
      .filter(f => keep(PagesSource.urlOf(f))) // pruned BEFORE planning
      .sortBy(_.getName)
    files.map(f => PageInputPartition(f.getAbsolutePath, f.lastModified())
      : InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagesReaderFactory(requiredSchema)
}

case class PageInputPartition(filePath: String, mtimeMs: Long) extends InputPartition

class PagesReaderFactory(requiredSchema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PageInputPartition]
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = !consumed && { consumed = true; true }
      override def get(): InternalRow = {
        val file = new java.io.File(p.filePath)
        val row = new GenericInternalRow(requiredSchema.length)
        requiredSchema.fieldNames.zipWithIndex.foreach {
          case ("url", i) =>
            row.update(i, UTF8String.fromString(PagesSource.urlOf(file)))
          case ("html", i) =>
            // file bytes are read ONLY when the query projects html —
            // the column-pruning payoff
            row.update(i, UTF8String.fromString(
              new String(java.nio.file.Files.readAllBytes(file.toPath),
                java.nio.charset.StandardCharsets.UTF_8)))
          case ("fetched_at", i) =>
            row.update(i, p.mtimeMs * 1000L) // micros
          case (other, _) =>
            throw new IllegalStateException(s"unknown column $other")
        }
        row
      }
      override def close(): Unit = ()
    }
  }
}
