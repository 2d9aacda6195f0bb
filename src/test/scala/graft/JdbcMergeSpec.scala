package graft

import java.sql.DriverManager
import java.util.Properties

import graft.dims.CoalesceMerge
import graft.dims.CoalesceMerge.{CoalesceNewWins, InsertOnly, Overwrite, Rule}
import graft.sources.JdbcMerge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rule-for-rule parity of the JDBC merge with the managed-parquet
  * CoalesceMerge.upsert, against embedded Derby (offline-safe — derby.jar
  * ships in the Spark distribution). Every scenario computes the expected
  * state through CoalesceMerge and the actual state through
  * JdbcMerge.upsert + spark.read.jdbc on the same inputs. */
class JdbcMergeSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private def props = new Properties()

  private def withTable(name: String, ddlCols: String)(body: String => Unit): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(s"""DROP TABLE "$name"""") catch { case _: Throwable => () }
      st.execute(s"""CREATE TABLE "$name" ($ddlCols)""")
      st.close()
    } finally conn.close()
    body("\"" + name + "\"")
  }

  /** Seed the Derby table with the target rows (plain inserts). */
  private def seed(table: String, target: DataFrame, keys: Seq[String]): Unit =
    JdbcMerge.upsert(target, url, table, keys, dedupSource = false)

  private def readBack(table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map { r =>
      df.columns.sorted.map(c => s"$c=${r.getAs[Any](c)}").mkString("|")
    }.toSet

  private def parity(target: DataFrame, source: DataFrame, keys: Seq[String],
                     rules: Map[String, Rule], table: String): Unit = {
    val expected = CoalesceMerge.upsert(target, source, keys, rules)
      .drop("_action")
    seed(table, target, keys)
    JdbcMerge.upsert(source, url, table, keys, rules, props)
    assert(asSet(readBack(table)) == asSet(expected))
  }

  private val ddl =
    """"k" BIGINT NOT NULL, "name" VARCHAR(64), "score" DOUBLE"""

  test("default CoalesceNewWins: non-null source wins, nulls never clobber") {
    val target = Seq((1L, "alice", 1.0), (2L, "bob", 2.0))
      .toDF("k", "name", "score")
    val source = Seq(
      (1L, Option.empty[String], Option(9.0)), // null name keeps alice
      (3L, Option("carol"), Option(3.0)),      // fresh insert
    ).toDF("k", "name", "score")
    withTable("t_coalesce", ddl)(t => parity(target, source, Seq("k"), Map.empty, t))
  }

  test("mixed rules: Overwrite clobbers with null, InsertOnly keeps target") {
    val target = Seq((1L, "alice", 1.0), (2L, "bob", 2.0))
      .toDF("k", "name", "score")
    val source = Seq(
      (1L, Option.empty[String], Option(9.0)),
      (2L, Option("robert"), Option.empty[Double]),
      (4L, Option("dave"), Option(4.0)),
    ).toDF("k", "name", "score")
    val rules: Map[String, Rule] = Map("name" -> Overwrite, "score" -> InsertOnly)
    withTable("t_mixed", ddl)(t => parity(target, source, Seq("k"), rules, t))
  }

  test("all-InsertOnly: matched rows fully kept (no-op update probe)") {
    val target = Seq((1L, "alice", 1.0)).toDF("k", "name", "score")
    val source = Seq((1L, "ALICE", 99.0), (2L, "bob", 2.0))
      .toDF("k", "name", "score")
    val rules: Map[String, Rule] =
      Map("name" -> InsertOnly, "score" -> InsertOnly)
    withTable("t_insonly", ddl)(t => parity(target, source, Seq("k"), rules, t))
  }

  test("null keys never match: null-key source rows insert") {
    val target = Seq((Option(1L), "alice", 1.0)).toDF("k", "name", "score")
    val source = Seq(
      (Option.empty[Long], "ghost", 0.0),
      (Option(1L), "alicia", 1.5),
    ).toDF("k", "name", "score")
    withTable("t_nullkey",
      """"k" BIGINT, "name" VARCHAR(64), "score" DOUBLE""")(t =>
      parity(target, source, Seq("k"), Map.empty, t))
  }

  test("duplicate source keys collapse to the deterministic winner") {
    val target = Seq((1L, "alice", 1.0)).toDF("k", "name", "score")
    val source = Seq(
      (2L, "z-dup", 9.0), (2L, "a-dup", 8.0), // dedup keeps smallest tuple
      (1L, "alicia", 1.5),
    ).toDF("k", "name", "score")
    withTable("t_dup", ddl)(t => parity(target, source, Seq("k"), Map.empty, t))
  }

  test("composite keys and a re-run are idempotent (foreachBatch shape)") {
    val target = Seq((1L, "a", "x", 1.0)).toDF("k1", "k2", "name", "score")
    val source = Seq((1L, "a", "x2", 2.0), (2L, "b", "y", 3.0))
      .toDF("k1", "k2", "name", "score")
    withTable("t_batch",
      """"k1" BIGINT, "k2" VARCHAR(8), "name" VARCHAR(64), "score" DOUBLE""") { t =>
      val expected = CoalesceMerge.upsert(target, source, Seq("k1", "k2"),
        Map.empty).drop("_action")
      seed(t, target, Seq("k1", "k2"))
      val write = JdbcMerge.foreachBatchUpsert(url, t, Seq("k1", "k2"))
      write(source, 0L)
      write(source, 1L) // replayed micro-batch: same assignments, same state
      assert(asSet(readBack(t)) == asSet(expected))
    }
  }

  test("readPartitioned splits the scan into the requested partitions") {
    withTable("t_read", """"k" BIGINT NOT NULL, "name" VARCHAR(64), "score" DOUBLE""") { t =>
      val rows = (1L to 100L).map(i => (i, s"n$i", i * 0.5)).toDF("k", "name", "score")
      seed(t, rows, Seq("k"))
      val got = JdbcMerge.readPartitioned(spark, url, t, """"k"""",
        lowerBound = 1L, upperBound = 101L, numPartitions = 4, props)
      assert(got.rdd.getNumPartitions == 4)
      assert(got.count() == 100L)
      assert(got.agg(sum(col("k"))).head().getLong(0) == 5050L)
    }
  }
}
