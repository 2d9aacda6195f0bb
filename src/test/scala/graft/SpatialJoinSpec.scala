package graft

import graft.plans.SpatialJoin
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial radius join: equivalence with the naive theta
  * join (including points straddling cell boundaries), and the no-dedup
  * property (each pair appears exactly once). */
class SpatialJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftPts = (1 to 120).map { i =>
    (i.toLong, (i * 37 % 100) / 7.3, (i * 61 % 100) / 5.1)
  }.toDF("lid", "llat", "llon")

  private def rightPts = (1 to 90).map { j =>
    (j.toLong, (j * 53 % 100) / 7.3, (j * 29 % 100) / 5.1)
  }.toDF("rid", "rlat", "rlon")

  test("radius2d equals the naive theta join") {
    val r = 2.5
    val got = SpatialJoin.radius2d(leftPts, rightPts,
        "llat", "llon", "rlat", "rlon", r)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    val want = leftPts.join(rightPts,
        (col("llat") - col("rlat")) * (col("llat") - col("rlat")) +
          (col("llon") - col("rlon")) * (col("llon") - col("rlon")) <= r * r)
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("each qualifying pair appears exactly once (no cell-dedup needed)") {
    val got = SpatialJoin.radius2d(leftPts, rightPts,
        "llat", "llon", "rlat", "rlon", 2.5)
      .groupBy("lid", "rid").count().filter(col("count") > 1)
    assert(got.count() == 0)
  }
}
