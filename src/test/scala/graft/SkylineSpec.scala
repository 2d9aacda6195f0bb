package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

/** Skyline operator: equivalence with the O(n²) NOT-EXISTS definition
  * (including tie handling on both axes) on randomized data. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame) = {
    val o = df.select(col("x").as("ox"), col("y").as("oy"))
    df.join(o,
        o("ox") <= df("x") && o("oy") >= df("y") &&
          (o("ox") < df("x") || o("oy") > df("y")), "left_anti")
  }

  test("pareto2d equals brute-force NOT-EXISTS (with ties)") {
    // deterministic pseudo-random points with deliberate duplicates
    val pts = (1 to 300).map { i =>
      val x = (i * 2654435761L % 97) / 10.0
      val y = (i * 1099511628211L % 53).toInt
      (i.toLong, x, y)
    } ++ Seq((301L, 1.5, 40), (302L, 1.5, 40)) // exact tie pair
    val df = pts.toDF("id", "x", "y")
    val got = Skyline.pareto2d(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val want = brute(df).select("id").as[Long].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(got.nonEmpty)
  }

  test("all-dominated collapses to the single best point") {
    val df = Seq((1L, 1.0, 10), (2L, 2.0, 9), (3L, 3.0, 8)).toDF("id", "x", "y")
    val got = Skyline.pareto2d(df, "x", "y").select("id").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }
}
