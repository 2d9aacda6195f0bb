package graft

import graft.plans.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks latest right <= left, inner semantics") {
    val left = Seq( // (user, p_id, p_us)
      (1L, 101L, 1000L),
      (1L, 102L, 2500L),
      (1L, 103L, 500L),  // before any right row -> dropped
      (2L, 201L, 9999L), // user with no right rows -> dropped
    ).toDF("user_id", "p_id", "p_us")
    val right = Seq( // (user, v_id, v_us)
      (1L, 11L, 900L),
      (1L, 12L, 2000L),
      (1L, 13L, 3000L), // after every left row
    ).toDF("user_id", "v_id", "v_us")

    val out = AsOfJoin.join(left, right, "user_id", "p_us", "v_us", "v_id")
      .orderBy("p_id")
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("v_id")))
    assert(out.toSeq == Seq((101L, 11L), (102L, 12L)))
  }

  test("matched right row is carried atomically: its nulls stay null") {
    // The most-recent right row has a NULL payload column; per DuckDB
    // ASOF semantics that null must NOT be back-filled from an older row.
    val left = Seq((1L, 101L, 3000L)).toDF("user_id", "p_id", "p_us")
    val right = Seq(
      (1L, 11L, 1000L, Option("old-note")),
      (1L, 12L, 2000L, Option.empty[String]), // the match; note is null
    ).toDF("user_id", "v_id", "v_us", "note")
    val out = AsOfJoin.join(left, right, "user_id", "p_us", "v_us", "v_id")
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("v_id") == 12L)
    assert(out(0).getAs[String]("note") == null) // not "old-note"
  }

  test("equal timestamps match (<=) and ties dedup to max right id") {
    val left = Seq((1L, 101L, 1000L)).toDF("user_id", "p_id", "p_us")
    val right = Seq((1L, 11L, 1000L), (1L, 12L, 1000L))
      .toDF("user_id", "v_id", "v_us")
    val out = AsOfJoin.join(left, right, "user_id", "p_us", "v_us", "v_id")
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("v_id") == 12L) // max id wins the tie
  }

  test("forward direction picks earliest right >= left (inclusive)") {
    val left = Seq(
      (1L, 101L, 1000L), // next right at 1000 (equal, inclusive)
      (1L, 102L, 1500L), // next right at 2000
      (1L, 103L, 2500L), // nothing after -> dropped
    ).toDF("user_id", "p_id", "p_us")
    val right = Seq(
      (1L, 11L, 500L),
      (1L, 12L, 1000L),
      (1L, 13L, 2000L),
    ).toDF("user_id", "v_id", "v_us")
    val out = AsOfJoin.join(left, right, "user_id", "p_us", "v_us", "v_id",
        direction = "forward")
      .orderBy("p_id")
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("v_id")))
    assert(out.toSeq == Seq((101L, 12L), (102L, 13L)))
  }
}
