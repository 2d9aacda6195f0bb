package graft.plans

import graft.vector.{HnswIndex, IvfIndex}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StringType, StructType}

/** SQL surface for the ANN index lifecycle — the reference creates and
  * attaches its HNSW index in SQL (`CREATE INDEX ... USING hnsw`,
  * reference src/shared/db/database.py:201-210) and the planner picks it
  * up from then on; this parser gives the Spark engine the same
  * SQL-only contract. Injected via `SparkSessionExtensions.injectParser`
  * ([[graft.GraftExtensions]]); everything that is not a GRAFT statement
  * delegates to Spark's own parser unchanged.
  *
  * {{{
  *   GRAFT CREATE ANN INDEX USING IVF  ON '<tablePath>' (embCol, idCol)
  *     AT '<indexPath>' [OPTIONS (cells=16, nprobe=4, kmeans_iters=0)]
  *   GRAFT CREATE ANN INDEX USING HNSW ON '<tablePath>' (embCol, idCol)
  *     AT '<indexPath>' [OPTIONS (m=8, ef_construction=64, ef_search=48,
  *                                max_partition_rows=500000)]
  *   GRAFT CREATE ANN INDEX USING ROUTED_HNSW ON '<tablePath>' (embCol, idCol)
  *     AT '<indexPath>' [OPTIONS (cells=16, nprobe=4, kmeans_iters=0,
  *                                m=8, ef_construction=64, ef_search=48,
  *                                max_partition_rows=500000)]
  *   GRAFT ATTACH ANN INDEX '<indexPath>' TO '<tablePath>'
  *   GRAFT DROP ANN INDEX ON '<tablePath>'
  *   GRAFT SHOW ANN INDEXES
  * }}}
  *
  * CREATE builds the index, persists it (with its `_graft_ann`
  * descriptor) and registers it in [[AnnCatalog]]; ATTACH re-registers a
  * persisted index in a fresh session from that descriptor — the
  * CREATE-once / planner-uses-it-forever contract.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseGraft(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftSqlParser {

  private val Create =
    ("""(?is)^\s*GRAFT\s+CREATE\s+ANN\s+INDEX\s+USING\s+(IVF|HNSW|ROUTED_HNSW)\s+ON\s+""" +
      """'([^']+)'\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)\s+AT\s+'([^']+)'""" +
      """(?:\s+OPTIONS\s*\(([^)]*)\))?\s*;?\s*$""").r
  private val Attach =
    """(?is)^\s*GRAFT\s+ATTACH\s+ANN\s+INDEX\s+'([^']+)'\s+TO\s+'([^']+)'\s*;?\s*$""".r
  private val Drop =
    """(?is)^\s*GRAFT\s+DROP\s+ANN\s+INDEX\s+ON\s+'([^']+)'\s*;?\s*$""".r
  private val Show =
    """(?is)^\s*GRAFT\s+SHOW\s+ANN\s+INDEXES\s*;?\s*$""".r
  private val Maintain =
    ("""(?is)^\s*GRAFT\s+MAINTAIN\s+ANN\s+INDEX\s+ON\s+'([^']+)'""" +
      """(?:\s+OPTIONS\s*\(([^)]*)\))?\s*;?\s*$""").r

  private[plans] def parseGraft(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case Create(kind, table, embCol, idCol, index, opts) =>
        Some(CreateAnnIndexCommand(kind.toLowerCase, table, embCol, idCol,
          index, parseOptions(Option(opts))))
      case Attach(index, table) => Some(AttachAnnIndexCommand(index, table))
      case Drop(table) => Some(DropAnnIndexCommand(table))
      case Show() => Some(ShowAnnIndexesCommand())
      case Maintain(table, opts) =>
        Some(MaintainAnnIndexCommand(table, parseOptions(Option(opts))))
      case _ => None
    }

  private def parseOptions(opts: Option[String]): Map[String, String] =
    opts.map(_.trim).filter(_.nonEmpty).fold(Map.empty[String, String]) { s =>
      s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
        val parts = kv.split("=", 2)
        require(parts.length == 2, s"malformed ANN index option '$kv' " +
          "(expected key = value)")
        parts(0).trim.toLowerCase -> parts(1).trim
      }.toMap
    }
}

/** Build + persist + register an index over the parquet table at
  * `tablePath`. */
case class CreateAnnIndexCommand(kind: String, tablePath: String,
                                 embCol: String, idCol: String,
                                 indexPath: String,
                                 opts: Map[String, String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())

  private def intOpt(key: String, default: Int): Int =
    opts.get(key).map(Integer.parseInt).getOrElse(default)

  override def run(spark: SparkSession): Seq[Row] = {
    val df = spark.read.parquet(tablePath)
    val known = kind match {
      case "ivf" => Set("cells", "nprobe", "kmeans_iters")
      case "routed_hnsw" => Set("cells", "nprobe", "kmeans_iters",
        "m", "ef_construction", "ef_search", "max_partition_rows")
      case _ => Set("m", "ef_construction", "ef_search", "max_partition_rows")
    }
    val unknown = opts.keySet.diff(known)
    require(unknown.isEmpty,
      s"unknown $kind index option(s): ${unknown.mkString(", ")} " +
        s"(known: ${known.mkString(", ")})")
    val msg = kind match {
      case "ivf" =>
        val cells = intOpt("cells", 16)
        val nProbe = intOpt("nprobe", 4)
        val iters = intOpt("kmeans_iters", 0)
        val cs =
          if (iters > 0) IvfIndex.kmeansCentroids(df, embCol, idCol, cells, iters)
          else IvfIndex.centroids(df, embCol, idCol, cells)
        IvfIndex.writeIndex(IvfIndex.build(df, embCol, idCol, cs), indexPath)
        AnnCatalog.registerAndPersist(tablePath,
          AnnCatalog.IvfEntry(indexPath, embCol, idCol, cs, nProbe))
        s"created ivf index $indexPath on $tablePath " +
          s"(cells=$cells, nprobe=$nProbe, kmeans_iters=$iters)"
      case "hnsw" =>
        val params = HnswIndex.Params(
          m = intOpt("m", 8),
          efConstruction = intOpt("ef_construction", 64),
          efSearch = intOpt("ef_search", 48))
        HnswIndex.writeGraphIndex(df, embCol, idCol, indexPath, params,
          maxPartitionRows = intOpt("max_partition_rows", 500000))
        AnnCatalog.registerAndPersist(tablePath,
          AnnCatalog.HnswEntry(indexPath, embCol, idCol, params))
        s"created hnsw index $indexPath on $tablePath " +
          s"(m=${params.m}, ef_construction=${params.efConstruction}, " +
          s"ef_search=${params.efSearch})"
      case "routed_hnsw" =>
        val cells = intOpt("cells", 16)
        val nProbe = intOpt("nprobe", 4)
        val iters = intOpt("kmeans_iters", 0)
        val params = HnswIndex.Params(
          m = intOpt("m", 8),
          efConstruction = intOpt("ef_construction", 64),
          efSearch = intOpt("ef_search", 48))
        val cs =
          if (iters > 0) IvfIndex.kmeansCentroids(df, embCol, idCol, cells, iters)
          else IvfIndex.centroids(df, embCol, idCol, cells)
        graft.vector.RoutedHnsw.writeRoutedIndex(df, embCol, idCol, indexPath,
          cs, params, maxPartitionRows = intOpt("max_partition_rows", 500000))
        AnnCatalog.registerAndPersist(tablePath,
          AnnCatalog.RoutedHnswEntry(indexPath, embCol, idCol, cs, nProbe, params))
        s"created routed_hnsw index $indexPath on $tablePath " +
          s"(cells=$cells, nprobe=$nProbe, m=${params.m}, " +
          s"ef_construction=${params.efConstruction}, ef_search=${params.efSearch})"
      case other => sys.error(s"unknown ANN index kind $other")
    }
    Seq(Row(msg))
  }
}

/** Re-register a persisted index from its `_graft_ann` descriptor — the
  * fresh-session half of the CREATE-once contract. */
case class AttachAnnIndexCommand(indexPath: String, tablePath: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val entry = AnnCatalog.attach(tablePath, indexPath)
    Seq(Row(s"attached ${entry.getClass.getSimpleName
      .stripSuffix("$").toLowerCase} $indexPath to $tablePath"))
  }
}

case class DropAnnIndexCommand(tablePath: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    AnnCatalog.unregister(tablePath)
    Seq(Row(s"dropped ann index registration for $tablePath"))
  }
}

/** The REINDEX analogue: check the registered IVF index for drift and
  * re-cluster when degraded ([[graft.vector.IvfIndex.maintainIndex]] —
  * rebuild on cell skew, else recluster-if-improves). Refreshes both the
  * at-rest descriptor and the live catalog registration when a rebuild
  * happens. Options: cells (default: current centroid count), max_skew,
  * kmeans_iters. */
case class MaintainAnnIndexCommand(tablePath: String,
                                   opts: Map[String, String])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val unknown = opts.keySet.diff(Set("cells", "max_skew", "kmeans_iters"))
    require(unknown.isEmpty,
      s"unknown maintain option(s): ${unknown.mkString(", ")} " +
        "(known: cells, max_skew, kmeans_iters)")
    val entry = AnnCatalog.lookup(Seq(tablePath)).getOrElse(
      throw new IllegalArgumentException(
        s"no ANN index registered for $tablePath (GRAFT ATTACH it first)"))
    entry match {
      case AnnCatalog.IvfEntry(indexPath, embCol, idCol, cs, nProbe) =>
        val cells = opts.get("cells").map(Integer.parseInt).getOrElse(cs.length)
        val maxSkew = opts.get("max_skew").map(_.toDouble).getOrElse(4.0)
        val iters = opts.get("kmeans_iters").map(Integer.parseInt).getOrElse(3)
        val (newCs, rebuilt) = IvfIndex.maintainIndex(spark, indexPath,
          embCol, idCol, cs, cells, maxSkew, kmeansIters = iters)
        if (rebuilt)
          AnnCatalog.register(tablePath,
            AnnCatalog.IvfEntry(indexPath, embCol, idCol, newCs, nProbe))
        Seq(Row(if (rebuilt)
          s"re-clustered ivf index $indexPath (cells=$cells)"
        else s"index $indexPath healthy — no rebuild"))
      case AnnCatalog.RoutedHnswEntry(indexPath, embCol, idCol, cs, nProbe,
          params) =>
        val cells = opts.get("cells").map(Integer.parseInt).getOrElse(cs.length)
        val maxSkew = opts.get("max_skew").map(_.toDouble).getOrElse(4.0)
        val iters = opts.get("kmeans_iters").map(Integer.parseInt).getOrElse(3)
        val (newCs, rebuilt) = graft.vector.RoutedHnsw.maintainIndex(spark,
          indexPath, embCol, idCol, cs, cells, maxSkew, kmeansIters = iters)
        if (rebuilt)
          AnnCatalog.register(tablePath,
            AnnCatalog.RoutedHnswEntry(indexPath, embCol, idCol, newCs,
              nProbe, params))
        Seq(Row(if (rebuilt)
          s"re-clustered routed_hnsw index $indexPath (cells=$cells)"
        else s"index $indexPath healthy — no rebuild"))
      case _: AnnCatalog.HnswEntry =>
        // HNSW degrades by sub-graph overflow, which addToGraphIndex
        // fails fast on; a rebuild is writeGraphIndex, not a re-cluster
        Seq(Row(s"hnsw index for $tablePath needs no centroid " +
          "maintenance (re-split via writeGraphIndex when the row cap " +
          "is hit)"))
    }
  }
}

case class ShowAnnIndexesCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_path", StringType, nullable = false)(),
    AttributeReference("kind", StringType, nullable = false)(),
    AttributeReference("index_path", StringType, nullable = false)(),
    AttributeReference("emb_col", StringType, nullable = false)(),
    AttributeReference("id_col", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    AnnCatalog.list.map {
      case (table, e: AnnCatalog.IvfEntry) =>
        Row(table, "ivf", e.indexPath, e.embCol, e.idCol)
      case (table, e: AnnCatalog.HnswEntry) =>
        Row(table, "hnsw", e.indexPath, e.embCol, e.idCol)
      case (table, e: AnnCatalog.RoutedHnswEntry) =>
        Row(table, "routed_hnsw", e.indexPath, e.embCol, e.idCol)
    }
}
