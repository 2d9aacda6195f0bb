package graft

import graft.vector.{TopKBuffer, TopKAggregate}
import graft.vector.TopKAggregate.topk_by_score
import org.apache.spark.sql.functions._

class TopKAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("buffer keeps k best with (score desc, id asc) tie-break") {
    val b = new TopKBuffer(3)
    Seq((1.0, 10L), (3.0, 30L), (2.0, 20L), (0.5, 5L), (3.0, 29L))
      .foreach { case (s, i) => b.insert(s, i) }
    assert(b.scores.toSeq == Seq(3.0, 3.0, 2.0))
    assert(b.ids.toSeq == Seq(29L, 30L, 20L)) // tie -> lower id first
  }

  test("aggregate matches window row_number <= k, across partitions") {
    val df = (1 to 1000).map(i => (i % 7, i.toLong, (i * 37 % 100) / 100.0))
      .toDF("grp", "id", "score").repartition(8)
    val viaAgg = df.groupBy($"grp")
      .agg(topk_by_score($"score", $"id", 5).as("top"))
      .select($"grp", posexplode($"top"))
      .select($"grp", $"col.id".as("id"), $"col.score".as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"score".desc, $"id")
    val viaWindow = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).select($"grp", $"id", $"score")
    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaAgg).count() == 0)
  }

  test("serialize/deserialize round-trips the buffer") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = graft.vector.TopKByScore(
      ColumnBridge.expression(lit(0)), ColumnBridge.expression(lit(0L)), 4)
    val b = new TopKBuffer(4)
    b.insert(0.9, 1L); b.insert(0.1, 2L)
    val b2 = agg.deserialize(agg.serialize(b))
    assert(b2.k == 4 && b2.scores.toSeq == b.scores.toSeq &&
      b2.ids.toSeq == b.ids.toSeq)
  }
}
