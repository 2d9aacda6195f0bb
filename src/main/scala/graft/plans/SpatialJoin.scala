package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial radius join: all pairs (l, r) with planar distance ≤ `radius`
  * (degree-space approximation — the operator's point is the join
  * geometry, not geodesy; swap the final predicate for haversine when
  * the coordinate scale needs it).
  *
  * The 2D analog of [[RangeJoin]]: both sides are bucketed into
  * radius-sized grid cells; any right point within `radius` of a left
  * point lies in one of the 3×3 cells around the left point's cell, so
  * the LEFT side explodes into its 9 neighbor cells (bounded inflation)
  * and the join becomes a plain equi-join on the cell id + an exact
  * distance filter. Each side shuffles ONCE on the cell; per-task work
  * is proportional to genuinely-near pairs — never the full cross
  * product a naive theta-join plans (BroadcastNestedLoopJoin). Cell
  * density skew (a hot city) is ordinary equi-join skew: AQE skew
  * splitting or upstream salting applies unchanged at 100 TB.
  *
  * Left/right column names must be fully disjoint (including the
  * coordinate columns — shared names would make the final distance
  * predicate ambiguous), and neither side may already have a `_cell`
  * column.
  */
object SpatialJoin {

  def radius2d(left: DataFrame, right: DataFrame,
               lLat: String, lLon: String, rLat: String, rLon: String,
               radius: Double): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val overlap = left.columns.intersect(right.columns)
    require(overlap.isEmpty,
      s"left/right column names must be disjoint, both have: ${overlap.mkString(",")}")
    val cellTaken = (left.columns ++ right.columns).contains("_cell")
    require(!cellTaken, "input columns collide with SpatialJoin temp name _cell")
    val cells = (-1 to 1).flatMap(dx => (-1 to 1).map(dy => (dx, dy)))
    val l = left.withColumn("_cell",
      explode(array(cells.map { case (dx, dy) =>
        struct((floor(col(lLat) / radius) + dx).as("cx"),
          (floor(col(lLon) / radius) + dy).as("cy"))
      }: _*)))
    val r = right.withColumn("_cell",
      struct(floor(col(rLat) / radius).as("cx"),
        floor(col(rLon) / radius).as("cy")))
    l.join(r, Seq("_cell"))
      .filter(
        (col(lLat) - col(rLat)) * (col(lLat) - col(rLat)) +
          (col(lLon) - col(rLon)) * (col(lLon) - col(rLon))
          <= lit(radius * radius))
      .drop("_cell")
    // no dedup needed: a right point has ONE cell id, so each (l, r)
    // pair joins through exactly one of the left row's 9 cells
  }
}
