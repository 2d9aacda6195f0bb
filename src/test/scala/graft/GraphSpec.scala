package graft

import graft.graph.Graph
import org.apache.spark.sql.functions._

/** Distributed graph primitives: min-label-propagation components vs a
  * known partition, and the integer fixed-point PageRank vs hand-computed
  * exact values (the point of fixed-point: the expected numbers are exact,
  * not approximate). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: min-label propagation finds the partition") {
    val ids = (1L to 8L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 8L), (8L, 1L))
      .toDF("id_a", "id_b")
    // components: {1,2,3,7,8} -> 1, {4} -> 4, {5,6} -> 5
    val cc = Graph.connectedComponents(ids, edges).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cc == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 1L, 8L -> 1L))
  }

  test("connected components: long path converges (label walks the chain)") {
    val n = 12L
    val ids = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Graph.connectedComponents(ids, edges)
    assert(cc.select(countDistinct(col("cluster_id"))).head().getLong(0) == 1L)
    assert(cc.filter(col("cluster_id") =!= 1L).count() == 0)
  }

  test("pointer-jumping closes a chain far deeper than maxIter") {
    // diameter 299 ≫ maxIter 20: without the shortcut self-join the label
    // walks one hop per superstep and maxIter would fire; with it the
    // reach doubles per superstep, so ~log2(300) ≈ 9 iterations suffice
    val n = 300L
    val ids = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Graph.connectedComponents(ids, edges, maxIter = 20, strict = true)
    assert(cc.filter(col("cluster_id") =!= 1L).count() == 0)
    assert(cc.count() == n)
  }

  test("strict mode throws when maxIter fires before convergence") {
    val ids = (1L to 40L).toDF("id")
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      Graph.connectedComponents(ids, edges, maxIter = 1, strict = true)
    }
  }

  test("edges may reference nodes missing from ids: labels still relay through them") {
    // 5—2—1 chain where only node 5 is in `ids`: the true component min
    // (1) must reach node 5 via the uncovered relay node 2, and the
    // output stays one-row-per-input-id
    val ids = Seq(5L).toDF("id")
    val edges = Seq((5L, 2L), (2L, 1L)).toDF("id_a", "id_b")
    val cc = Graph.connectedComponents(ids, edges).collect()
    assert(cc.length == 1)
    assert(cc.head.getLong(0) == 5L && cc.head.getLong(1) == 1L)
  }

  test("pagerank fixed point: exact hand-computed values after 2 iterations") {
    val edges = Seq((1L, 10L), (2L, 10L), (2L, 11L), (3L, 11L))
      .toDF("src", "dst")
    // n=5, init=2e11, teleport=3e10
    // iter1: m(10)=m(11)=3e11 -> 285000000000; sources -> 3e10
    // iter2: m(10)=m(11)=3e10+1.5e10=4.5e10 -> 3e10+38250000000=68250000000
    val pr = Graph.pageRankFixedPoint(edges, iterations = 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pr == Seq(
      1L -> 30000000000L, 2L -> 30000000000L, 3L -> 30000000000L,
      10L -> 68250000000L, 11L -> 68250000000L))
  }
}
