package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fixed-range uniform histogram for mergeable quantile estimation.
  *
  * The at-scale companion to exact `percentile` (q41): exact quantiles
  * need a full sort (or an ND-sketch with data-dependent internals);
  * this histogram is `bins` longs per group, combines map-side, merges
  * by vector add, and — because binning and interpolation are
  * closed-form IEEE arithmetic — the DuckDB oracle replays the estimate
  * bit-for-bit, like [[HllBuffer]].
  *
  * Out-of-range values clamp into the edge bins (a production pipeline
  * knows its metric envelope; clamping keeps the sketch total == row
  * count so ranks stay exact).
  */
final class HistBuffer(val lo: Double, val hi: Double, val bins: Int) {
  val counts: Array[Long] = new Array[Long](bins)
  private val w = (hi - lo) / bins

  def update(v: Double): Unit = {
    val idx0 = math.floor((v - lo) / w)
    val idx = if (idx0 < 0) 0 else if (idx0 >= bins) bins - 1 else idx0.toInt
    counts(idx) += 1
  }

  def mergeFrom(o: HistBuffer): Unit = {
    var i = 0
    while (i < bins) { counts(i) += o.counts(i); i += 1 }
  }

  /** Rank-interpolated estimate: rank = ceil(q·n); within the covering
    * bin, linear interpolation at (rank - cumBefore)/c of the bin width.
    * Returns null (None) on an empty group. */
  def estimate(q: Double): Option[Double] = {
    var n = 0L
    var i = 0
    while (i < bins) { n += counts(i); i += 1 }
    if (n == 0L) return None
    val rank = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    i = 0
    while (i < bins) {
      if (cum + counts(i) >= rank) {
        val inBin = (rank - cum).toDouble / counts(i)
        return Some(lo + w * (i + inBin))
      }
      cum += counts(i)
      i += 1
    }
    Some(hi) // unreachable: total == n >= rank
  }
}

/** `hist_quantile(col, q, lo, hi, bins)` — mergeable approximate
  * quantile as a custom Catalyst aggregate (SURVEY §2.12 extension
  * point). Fixed sketch size (8·bins bytes per group) regardless of
  * input volume: at 100 TB the shuffle carries the histogram, never the
  * values. */
case class HistQuantileAgg(
    child: Expression, q: Double, lo: Double, hi: Double, bins: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistBuffer] {

  require(hi > lo, s"hist_quantile needs hi > lo, got [$lo, $hi]")
  require(bins > 0 && bins <= (1 << 20), s"bins must be in [1, 2^20], got $bins")
  require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): HistBuffer =
    new HistBuffer(lo, hi, bins)

  override def update(b: HistBuffer, input: InternalRow): HistBuffer = {
    val v = child.eval(input)
    if (v != null) b.update(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case n: Number => n.doubleValue()
    })
    b
  }

  override def merge(b: HistBuffer, o: HistBuffer): HistBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: HistBuffer): Any = b.estimate(q).orNull

  override def serialize(b: HistBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeDouble(b.lo); out.writeDouble(b.hi); out.writeInt(b.bins)
    var i = 0
    while (i < b.bins) { out.writeLong(b.counts(i)); i += 1 }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HistBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new HistBuffer(in.readDouble(), in.readDouble(), in.readInt())
    var i = 0
    while (i < b.bins) { b.counts(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): HistQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistQuantileAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c(0))
}

object HistQuantile {
  def hist_quantile(col: Column, q: Double, lo: Double, hi: Double,
                    bins: Int = 256): Column =
    ColumnBridge.column(
      HistQuantileAgg(ColumnBridge.expression(col), q, lo, hi, bins)
        .toAggregateExpression())
}
