package graft.plans

import graft.vector.{CosineSimilarity, HnswIndex, IvfIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, FloatType}

import scala.collection.concurrent.TrieMap

/** Registry of stored ANN indexes keyed by the BASE TABLE's storage path.
  *
  * The reference attaches its HNSW index to the table itself: a plain
  * `ORDER BY embedding <=> :q LIMIT k` query uses the index with no query
  * change (reference src/shared/db/database.py:201-210 — the index is
  * created once and the planner picks it up). This catalog plus
  * [[AnnIndexRule]] reproduces that contract on Spark: register a stored
  * index against the table path once, and every naturally-written
  * brute-force top-k over that table plans into the index probe.
  *
  * Keys are FULLY-QUALIFIED filesystem URIs (the bare-local path a user
  * wrote and the `file:` root the file index reports both qualify to the
  * same key, but `s3a://bucketA/t` and `hdfs://nn/t` stay distinct — a
  * scheme-stripping normalization would let a lookup silently serve rows
  * from a different table's index).
  */
object AnnCatalog {

  sealed trait Entry {
    def embCol: String
    def idCol: String
  }

  /** A stored [[IvfIndex]] (`writeIndex` layout: parquet partitioned by
    * `centroid_id`). Probes read ~nProbe/centroids of the stored bytes
    * via partition pruning. */
  final case class IvfEntry(indexPath: String, embCol: String, idCol: String,
                            centroids: Array[(Int, Array[Float])],
                            nProbe: Int) extends Entry

  /** A stored [[HnswIndex]] graph index (`writeGraphIndex` layout: one
    * serialized sub-graph per partition). Probes skip the O(n·log n)
    * build entirely. */
  final case class HnswEntry(indexPath: String, embCol: String, idCol: String,
                             params: HnswIndex.Params) extends Entry

  private val entries = TrieMap.empty[String, Entry]

  private def norm(p: String): String = {
    val path = new org.apache.hadoop.fs.Path(p)
    val hadoopConf = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    try path.getFileSystem(hadoopConf).makeQualified(path).toString
    catch {
      // scheme without a loadable FS impl: keep the full URI (scheme +
      // authority intact) so distinct stores still key distinctly
      case scala.util.control.NonFatal(_) => path.toUri.toString
    }
  }

  def register(tablePath: String, entry: Entry): Unit =
    entries.put(norm(tablePath), entry)

  def unregister(tablePath: String): Unit = entries.remove(norm(tablePath))

  def clear(): Unit = entries.clear()

  def isEmpty: Boolean = entries.isEmpty

  /** The entry for a scan, only when the scan reads exactly one root. */
  def lookup(rootPaths: Seq[String]): Option[Entry] =
    if (rootPaths.length != 1) None else entries.get(norm(rootPaths.head))

  // -------------------------------------------------- at-rest catalog
  //
  // The reference's index attachment is persistent (CREATE INDEX once,
  // every later connection's planner uses it). The in-memory map above
  // is session state, so the registration is ALSO persisted as a small
  // descriptor INSIDE the index directory — the index is self-
  // describing, and a fresh session re-attaches with one call:
  //   AnnCatalog.registerAndPersist(tablePath, entry)   // build side
  //   AnnCatalog.attach(tablePath, indexPath)           // serve side
  // Hadoop FS API throughout, so the descriptor lives wherever the
  // index lives (HDFS/S3/local alike).

  private val DescriptorFile = "_graft_ann"
  private val Magic = "GANN"

  def registerAndPersist(tablePath: String, entry: Entry): Unit = {
    register(tablePath, entry)
    val indexPath = entry match {
      case IvfEntry(p, _, _, _, _) => p
      case HnswEntry(p, _, _, _) => p
    }
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(indexPath)
    val fs = dir.getFileSystem(conf)
    val out = new java.io.DataOutputStream(
      fs.create(new org.apache.hadoop.fs.Path(dir, DescriptorFile), true))
    try {
      out.writeBytes(Magic)
      entry match {
        case IvfEntry(_, embCol, idCol, cs, nProbe) =>
          out.writeByte(1)
          out.writeUTF(embCol); out.writeUTF(idCol); out.writeInt(nProbe)
          out.writeInt(cs.length)
          cs.foreach { case (cid, c) =>
            out.writeInt(cid); out.writeInt(c.length)
            c.foreach(out.writeFloat)
          }
        case HnswEntry(_, embCol, idCol, params) =>
          out.writeByte(2)
          out.writeUTF(embCol); out.writeUTF(idCol)
          out.writeInt(params.m); out.writeInt(params.efConstruction)
          out.writeInt(params.efSearch)
      }
    } finally out.close()
  }

  /** Re-attach a persisted index to `tablePath` in this session by
    * reading the descriptor [[registerAndPersist]] left inside the
    * index directory. */
  def attach(tablePath: String, indexPath: String): Entry = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(indexPath, DescriptorFile)
    val fs = p.getFileSystem(conf)
    val in = new java.io.DataInputStream(fs.open(p))
    val entry = try {
      val magic = new Array[Byte](4); in.readFully(magic)
      require(new String(magic, "US-ASCII") == Magic,
        s"not a graft ANN index descriptor: $p")
      in.readByte() match {
        case 1 =>
          val embCol = in.readUTF(); val idCol = in.readUTF()
          val nProbe = in.readInt()
          val cs = Array.fill(in.readInt()) {
            val cid = in.readInt()
            (cid, Array.fill(in.readInt())(in.readFloat()))
          }
          IvfEntry(indexPath, embCol, idCol, cs, nProbe)
        case 2 =>
          val embCol = in.readUTF(); val idCol = in.readUTF()
          HnswEntry(indexPath, embCol, idCol, HnswIndex.Params(
            in.readInt(), in.readInt(), in.readInt()))
        case other => sys.error(s"unknown ANN descriptor kind $other in $p")
      }
    } finally in.close()
    register(tablePath, entry)
    entry
  }
}

/** Optimizer rule: transparent ANN index selection.
  *
  * Rewrites the canonical brute-force vector top-k plan
  *
  * {{{
  *   GlobalLimit k
  *   +- LocalLimit k
  *      +- Sort [score DESC (, id ASC)], global
  *         +- Project [id, cosine_sim(emb, <literal query>) AS score]
  *            +- Relation parquet  <registered table>
  * }}}
  *
  * into a probe of the stored IVF or HNSW index registered for that
  * table in [[AnnCatalog]] — the Spark analogue of Postgres planning
  * `ORDER BY embedding <=> q LIMIT k` onto its HNSW index with no query
  * change (reference database.py:201-210). Both the DataFrame form
  * (`VectorFunctions.topK`) and the SQL form
  * (`SELECT id, cosine_sim(emb, q) AS s FROM t ORDER BY s DESC LIMIT k`)
  * produce this plan shape, so both are rewritten.
  *
  * Deliberately conservative — anything NOT matched falls back to the
  * (always-correct) brute-force scan:
  *  - the scan must be a bare single-root parquet relation, optionally
  *    under column-pruning Projects; ANY Filter disables the rewrite
  *    (the stored index covers the whole table, not a filtered subset);
  *  - the query vector must be a literal `array<float>`;
  *  - the projection must be exactly (id, score) for the registered
  *    id/embedding columns — extra payload columns don't fit the index
  *    row layout and would need a join-back;
  *  - the sort must lead with score DESC; one optional id ASC tiebreak
  *    is allowed (the convention `topK` emits).
  *
  * The replacement subtree is built with the public DataFrame API
  * ([[IvfIndex.search]] / [[HnswIndex.searchGraphIndex]]) and spliced in
  * under a Project that re-aliases its output to the original exprIds,
  * so parent operators (e.g. a rounding Project) resolve unchanged.
  * Output ordering (score DESC, id) is preserved by construction.
  *
  * Idempotent under fixed-point execution: the IVF probe contains a
  * Filter over the index relation and the HNSW probe contains no
  * cosine-sort-limit over a relation, so neither re-matches.
  */
class AnnIndexRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (AnnCatalog.isEmpty) plan
    else plan.transformUp {
      // PushProjectionThroughLimit may have moved a post-limit
      // projection (e.g. score rounding) between the limit and the
      // sort — accept one deterministic Project there and re-apply it
      // on top of the probe
      case gl @ GlobalLimit(IntegerLiteral(k),
          LocalLimit(IntegerLiteral(k2), body)) if k == k2 && k > 0 =>
        (body match {
          case s @ Sort(_, true, _, _) => Some((None: Option[Project], s))
          case p @ Project(pl, s @ Sort(_, true, _, _))
              if pl.forall(_.deterministic) => Some((Some(p), s))
          case _ => None
        }).flatMap { case (post, sort) =>
          rewrite(k, sort.order, sort.child).map { probed =>
            post.fold(probed: LogicalPlan)(p => Project(p.projectList, probed))
          }
        }.getOrElse(gl)
    }

  /** Look through attribute-only Projects to the underlying V1 file
    * relation; None if anything else (Filter, Join, …) intervenes. */
  private def bareRelation(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case lr: LogicalRelation => Some(lr)
      case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        bareRelation(c)
      case _ => None
    }

  private def rewrite(k: Int, orders: Seq[SortOrder],
                      child: LogicalPlan): Option[LogicalPlan] = {
    val (projList, below) = child match {
      case Project(pl, c) => (pl, c)
      case _ => return None
    }
    val lr = bareRelation(below).getOrElse(return None)
    val fs = lr.relation match {
      case f: HadoopFsRelation => f
      case _ => return None
    }
    val entry = AnnCatalog.lookup(fs.location.rootPaths.map(_.toString))
      .getOrElse(return None)

    // projection must be exactly (id, score-alias) in either order.
    // Two score shapes are recognized: cosine SIMILARITY (sorted DESC)
    // and cosine DISTANCE `1.0 - cosine_sim` — the literal pgvector
    // `embedding <=> q` shape the reference's queries sort ASC
    // (database.py:201-210; VectorFunctions.cosine_dist emits it).
    if (projList.length != 2) return None
    def cosOf(e: Expression): Option[(Array[Float], AttributeReference)] =
      e match {
        case c: CosineSimilarity => (c.left, c.right) match {
          case (a: AttributeReference, Literal(v: ArrayData, ArrayType(FloatType, _))) =>
            Some((v.toFloatArray(), a))
          case (Literal(v: ArrayData, ArrayType(FloatType, _)), a: AttributeReference) =>
            Some((v.toFloatArray(), a))
          case _ => None
        }
        case _ => None
      }
    val (scoreAlias, queryVec, embAttr, isDistance) = projList.collectFirst {
      case al @ Alias(child, _) if cosOf(child).isDefined =>
        val (v, a) = cosOf(child).get
        (al, v, a, false)
      case al @ Alias(Subtract(Literal(one, _), child, _), _)
          if one == 1.0 && cosOf(child).isDefined =>
        val (v, a) = cosOf(child).get
        (al, v, a, true)
    }.getOrElse(return None)
    val idAttr = projList.collectFirst {
      case a: AttributeReference => a
    }.getOrElse(return None)
    if (embAttr.name != entry.embCol || idAttr.name != entry.idCol) return None

    // sort: similarity DESC / distance ASC first, at most one id ASC
    // tiebreak after. Either form is only taken when a null score
    // cannot lead the output: the probe never emits null-embedding
    // rows, so a NULLS FIRST ordering (explicit desc_nulls_first, or
    // the plain-ASC default) would make brute force lead with rows the
    // probe cannot produce. Both branches therefore require NullsLast
    // (the DESC default) or a non-nullable embedding column. Residual
    // deviation, shared with pgvector (whose index scan never emits
    // NULL-vector rows): if the table has fewer than k non-null
    // embeddings the probe returns fewer rows than brute force, which
    // pads with null-score rows.
    val scoreLeads = orders.headOption.exists {
      case SortOrder(r: AttributeReference, Descending, no, _) if !isDistance =>
        r.exprId == scoreAlias.exprId &&
          (no == NullsLast || !embAttr.nullable)
      case SortOrder(r: AttributeReference, Ascending, no, _) if isDistance =>
        r.exprId == scoreAlias.exprId &&
          (no == NullsLast || !embAttr.nullable)
      case _ => false
    }
    val tieOk = orders.length match {
      case 1 => true
      case 2 => orders(1) match {
        case SortOrder(r: AttributeReference, Ascending, _, _) =>
          r.exprId == idAttr.exprId
        case _ => false
      }
      case _ => false
    }
    if (!scoreLeads || !tieOk) return None

    // a stale registration (index files moved/deleted) must degrade to
    // the always-correct brute-force scan, not fail the user's query
    // from inside the optimizer
    val analyzed = try {
      val spark = SparkSession.active
      val probe = entry match {
        case AnnCatalog.IvfEntry(path, embCol, idCol, cs, nProbe) =>
          IvfIndex.search(spark.read.parquet(path), embCol, idCol, cs,
            queryVec, k, nProbe)
        case AnnCatalog.HnswEntry(path, _, idCol, params) =>
          HnswIndex.searchGraphIndex(spark, path, idCol,
            Seq(0L -> queryVec), k, params).drop("query_id")
      }
      probe.queryExecution.analyzed
    } catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"AnnIndexRule: stored index for " +
          s"${fs.location.rootPaths.head} unusable (${e.getMessage}); " +
          "falling back to brute-force scan")
        return None
    }
    val pId = analyzed.output.head
    val pScore = analyzed.output(1)

    // splice under aliases carrying the ORIGINAL exprIds so the parent
    // plan resolves against the probe unchanged
    def as(src: Expression, target: Attribute): NamedExpression = {
      val cast: Expression =
        if (src.dataType == target.dataType) src else Cast(src, target.dataType)
      Alias(cast, target.name)(exprId = target.exprId,
        qualifier = target.qualifier)
    }
    // output = the sort-child Project's (id, score) attrs, in order —
    // the caller re-applies any post-limit projection on top. The probe
    // emits SIMILARITY; the distance form re-derives 1 - score (probe
    // order by similarity desc == distance asc, so ordering holds).
    val scoreExpr: Expression =
      if (isDistance) Subtract(Literal(1.0), pScore) else pScore
    val outProj = projList.map(_.toAttribute).map { a =>
      if (a.exprId == scoreAlias.exprId) as(scoreExpr, a)
      else as(pId, a)
    }
    logInfo(s"AnnIndexRule: rewrote brute-force top-$k over " +
      s"${fs.location.rootPaths.head} into ${entry.getClass.getSimpleName} probe")
    Some(Project(outProj, analyzed))
  }
}
