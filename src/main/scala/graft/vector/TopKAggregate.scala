package graft.vector

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs. */
final class TopKBuffer(val k: Int) {
  // simple sorted insertion — k is small (≤ a few hundred); the buffer is
  // per-group per-partition, so this is the map-side combine state
  var scores: Array[Double] = new Array[Double](0)
  var ids: Array[Long] = new Array[Long](0)

  private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def insert(s: Double, id: Long): Unit = {
    val n = scores.length
    if (n >= k && !beats(s, id, n - 1)) return
    var pos = n
    while (pos > 0 && beats(s, id, pos - 1)) pos -= 1
    val m = math.min(n + 1, k)
    val ns = new Array[Double](m)
    val ni = new Array[Long](m)
    System.arraycopy(scores, 0, ns, 0, pos)
    System.arraycopy(ids, 0, ni, 0, pos)
    ns(pos) = s; ni(pos) = id
    if (pos < m - 1) {
      System.arraycopy(scores, pos, ns, pos + 1, m - 1 - pos)
      System.arraycopy(ids, pos, ni, pos + 1, m - 1 - pos)
    }
    scores = ns; ids = ni
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.scores.length) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** Top-k (score, id) pairs per group as a custom catalyst aggregate
  * (SURVEY §2.12's declared extension point, M6/O3 at scale).
  *
  * Versus `row_number() OVER (... ORDER BY score) <= k`: a window must
  * shuffle and fully sort EVERY row of every group; this aggregate keeps
  * a k-bounded buffer per group and combines map-side, so the shuffle
  * carries at most k rows per group per partition. At 100 TB that is the
  * difference between a terabyte-scale sort and a megabyte-scale merge.
  *
  * Output: array<struct<score double, id bigint>> sorted score desc,
  * id asc (deterministic ties).
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKBuffer): Any = {
    val rows = new Array[Any](b.scores.length)
    var i = 0
    while (i < rows.length) {
      rows(i) = InternalRow(b.scores(i), b.ids(i))
      i += 1
    }
    new GenericArrayData(rows): ArrayData
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k); out.writeInt(b.scores.length)
    var i = 0
    while (i < b.scores.length) {
      out.writeDouble(b.scores(i)); out.writeLong(b.ids(i)); i += 1
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(in.readInt())
    val n = in.readInt()
    b.scores = new Array[Double](n); b.ids = new Array[Long](n)
    var i = 0
    while (i < n) { b.scores(i) = in.readDouble(); b.ids(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

object TopKAggregate {
  /** `topk_by_score($"score", $"id", k)` aggregate Column. */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}
