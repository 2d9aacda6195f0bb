package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
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

  /** ONE shared implementation of the listing + pushed-filter predicate
    * for both the row scan and the metadata-only aggregate scan — so a
    * filter type accepted by `pushFilters` can never be evaluated by one
    * path and silently ignored by the other. `strict = true` (the
    * aggregate path, where an ignored filter means a WRONG answer, not
    * just extra rows) throws on a filter this matcher doesn't know. */
  private[sources] def listMatchingFiles(path: String, pushed: Array[Filter],
                                         strict: Boolean): Array[java.io.File] = {
    def keep(url: String): Boolean = pushed.forall {
      case EqualTo("url", v: String) => url == v
      case StringStartsWith("url", p) => url.startsWith(p)
      case f if strict =>
        throw new IllegalStateException(
          s"pushed filter $f has no metadata evaluation — pushFilters and " +
            "listMatchingFiles are out of sync")
      case _ => true
    }
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".html"))
      .filter(f => keep(urlOf(f)))
  }
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var requiredSchema: StructType = PagesSource.schema
  private var pushed: Array[Filter] = Array.empty
  private var hadResidual = false
  private var pushedAgg: Option[Aggregation] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo("url", _: String) => true
      case StringStartsWith("url", _) => true
      case _ => false
    }
    pushed = supported
    hadResidual = rest.nonEmpty
    rest // residual filters Spark must still evaluate
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(required: StructType): Unit = {
    requiredSchema = required
  }

  /** Aggregate pushdown ([[SupportsPushDownAggregates]]): ungrouped
    * COUNT(*) / MIN(fetched_at) / MAX(fetched_at) are answerable from
    * file METADATA alone — the connector returns the final one-row
    * answer from the driver-side listing, and the query never launches
    * a per-file scan at all (the "how many pages / what's the crawl
    * horizon" audit over a 100 TB archive becomes a listing operation).
    * Refused when a residual (non-pushed) filter exists — Spark must
    * post-filter rows, so a metadata answer would overcount. */
  private def canAnswer(agg: Aggregation): Boolean = {
    def isFetchedAt(refs: Array[NamedReference]): Boolean =
      refs.length == 1 && refs(0).fieldNames.sameElements(Array("fetched_at"))
    !hadResidual && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isFetchedAt(m.references())
        case m: Max => isFetchedAt(m.references())
        case _ => false
      }
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canAnswer(agg)
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!canAnswer(agg)) return false
    pushedAgg = Some(agg)
    true
  }

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new PagesAggScan(path, pushed, agg)
    case None => new PagesScan(path, requiredSchema, pushed)
  }
}

/** Metadata-only scan for a completely-pushed aggregation: one input
  * partition carrying the already-final values (count of matching files,
  * min/max mtime). No file contents are ever opened. */
class PagesAggScan(path: String, pushed: Array[Filter], agg: Aggregation)
    extends Scan with Batch {

  private def fns: Array[AggregateFunc] = agg.aggregateExpressions

  override def readSchema(): StructType = StructType(fns.map {
    case _: CountStar => StructField("count(*)", LongType, nullable = false)
    case _: Min => StructField("min(fetched_at)", TimestampType, nullable = true)
    case _: Max => StructField("max(fetched_at)", TimestampType, nullable = true)
    case other => throw new IllegalStateException(s"unexpected agg $other")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pages-agg path=$path, pushedAggregates=[${fns.mkString(",")}], " +
      s"pushedFilters=[${pushed.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = PagesSource.listMatchingFiles(path, pushed, strict = true)
    val mtimes = files.map(_.lastModified())
    val values: Array[Any] = fns.map {
      case _: CountStar => files.length.toLong
      case _: Min => if (mtimes.isEmpty) null else mtimes.min * 1000L
      case _: Max => if (mtimes.isEmpty) null else mtimes.max * 1000L
      case other => throw new IllegalStateException(s"unexpected agg $other")
    }
    Array(AggResultPartition(values))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AggResultReaderFactory
}

case class AggResultPartition(values: Array[Any]) extends InputPartition

class AggResultReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val vs = partition.asInstanceOf[AggResultPartition].values
    new PartitionReader[InternalRow] {
      private var consumed = false
      override def next(): Boolean = !consumed && { consumed = true; true }
      override def get(): InternalRow = new GenericInternalRow(vs.clone())
      override def close(): Unit = ()
    }
  }
}

class PagesScan(path: String, requiredSchema: StructType,
                pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-pages path=$path, readSchema=[${requiredSchema.fieldNames.mkString(",")}], " +
      s"pushedFilters=[${pushed.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val files = PagesSource.listMatchingFiles(path, pushed, strict = false)
      .sortBy(_.getName) // pruned BEFORE planning
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
