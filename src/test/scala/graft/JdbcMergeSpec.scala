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

  test("failure injection: a mid-batch failure rolls back the open chunk " +
       "atomically; prior chunks stay committed; a fixed re-run converges") {
    withTable("t_rollback", ddl) { t =>
      val target = Seq((1L, "alice", 1.0)).toDF("k", "name", "score")
      seed(t, target, Seq("k"))
      // batchSize=2 → two chunks; the oversized name violates
      // VARCHAR(64) in the SECOND chunk, after chunk 1 committed
      val rows = Seq(
        (10L, "ok-a", 1.0), (11L, "ok-b", 2.0), // chunk 1: commits
        (12L, "x" * 100, 3.0), (13L, "ok-d", 4.0), // chunk 2: fails
      ).toDF("k", "name", "score").coalesce(1)
      intercept[Exception] {
        JdbcMerge.upsert(rows, url, t, Seq("k"), Map.empty, props,
          batchSize = 2, dedupSource = false)
      }
      // per-chunk commit contract: chunk 1 durable, the failing chunk
      // left NO partial state (13 rolled back together with 12)
      assert(readBack(t).collect().map(_.getAs[Long]("k")).toSet ==
        Set(1L, 10L, 11L))
      // the upsert is idempotent, so the standard recovery — fix the
      // bad row, re-run the WHOLE batch — converges without duplicates
      val fixed = Seq((10L, "ok-a", 1.0), (11L, "ok-b", 2.0),
        (12L, "ok-c", 3.0), (13L, "ok-d", 4.0)).toDF("k", "name", "score")
      JdbcMerge.upsert(fixed, url, t, Seq("k"), Map.empty, props)
      assert(readBack(t).collect().map(_.getAs[Long]("k")).toSet ==
        Set(1L, 10L, 11L, 12L, 13L))
    }
  }

  // ---- Postgres-dialect ON CONFLICT template (reference loader's
  // single-statement upsert). Derby cannot execute it offline, so these
  // tests prove the generated text's rule encoding two ways: exact
  // template assertions per rule, and a tiny interpreter that applies
  // the generated DO UPDATE clause to the same scenarios the ANSI
  // parity tests run, asserting the outcome equals CoalesceMerge.upsert.

  test("pg dialect: exact statement for mixed rules") {
    val sql = JdbcMerge.pgOnConflictSql("events",
      Seq("k", "name", "score", "note"), Seq("k"),
      Map("name" -> Overwrite, "score" -> InsertOnly))
    assert(sql ==
      """INSERT INTO events ("k", "name", "score", "note") """ +
      """VALUES (?, ?, ?, ?) ON CONFLICT ("k") """ +
      """DO UPDATE SET "name" = EXCLUDED."name", """ +
      """"note" = COALESCE(EXCLUDED."note", events."note")""")
  }

  test("pg dialect: all-InsertOnly collapses to DO NOTHING; keys never set") {
    val sql = JdbcMerge.pgOnConflictSql("t", Seq("k1", "k2", "v"),
      Seq("k1", "k2"), Map("v" -> InsertOnly))
    assert(sql.endsWith("""ON CONFLICT ("k1", "k2") DO NOTHING"""))
    val sql2 = JdbcMerge.pgOnConflictSql("t", Seq("k1", "k2", "v"),
      Seq("k1", "k2"))
    assert(!sql2.contains(""""k1" ="""), "key column must never be assigned")
    assert(!sql2.contains(""""k2" ="""), "key column must never be assigned")
  }

  /** Apply the generated ON CONFLICT statement's semantics to
    * (target, source) exactly as Postgres would: per source row, no
    * key match → insert; match → DO NOTHING keeps the target row, and
    * DO UPDATE applies each SET assignment, where `EXCLUDED.c` is the
    * source value and `table.c` the target value. Only the two
    * assignment shapes the generator can emit are interpreted. */
  private def runPgSemantics(sql: String, table: String,
                             cols: Seq[String], keys: Seq[String],
                             target: Seq[Map[String, Any]],
                             source: Seq[Map[String, Any]]): Seq[Map[String, Any]] = {
    val action = sql.substring(sql.indexOf(" DO ") + 1)
    val assigns: Map[String, String] = // col -> "coalesce" | "overwrite"
      if (action.startsWith("DO NOTHING")) Map.empty
      else action.stripPrefix("DO UPDATE SET ")
        .split(""", (?="[^"]+" = )""").map { a =>
        val Array(lhs, rhs) = a.split(" = ", 2)
        val c = lhs.stripPrefix("\"").stripSuffix("\"")
        if (rhs == s"""COALESCE(EXCLUDED."$c", $table."$c")""") c -> "coalesce"
        else if (rhs == s"""EXCLUDED."$c"""") c -> "overwrite"
        else fail(s"unrecognized assignment: $a")
      }.toMap
    val state = scala.collection.mutable.LinkedHashMap[Seq[Any], Map[String, Any]]()
    target.foreach { r => state(keys.map(r)) = r }
    source.foreach { r =>
      val k = keys.map(r)
      // SQL null never equals: a null key can't conflict, always inserts
      state.get(k).filter(_ => !k.contains(null)) match {
        case None => state(Seq(new Object) ++ k) = r // unique slot for inserts
        case Some(t0) =>
          if (assigns.nonEmpty) state(k) = t0 ++ assigns.map {
            case (c, "coalesce")  => c -> (if (r(c) != null) r(c) else t0(c))
            case (c, _)           => c -> r(c)
          }
      }
    }
    state.values.toSeq
  }

  private def pgParity(target: DataFrame, source: DataFrame,
                       keys: Seq[String], rules: Map[String, Rule]): Unit = {
    val cols = target.columns.toSeq
    val sql = JdbcMerge.pgOnConflictSql("t", cols, keys, rules)
    def rows(df: DataFrame) = df.collect().toSeq
      .map(r => cols.map(c => c -> r.getAs[Any](c)).toMap)
    val got = runPgSemantics(sql, "t", cols, keys, rows(target),
      rows(CoalesceMerge.dedupDeterministic(source, keys)))
      .map(m => cols.sorted.map(c => s"$c=${m(c)}").mkString("|")).toSet
    val want = CoalesceMerge.upsert(target, source, keys, rules)
      .drop("_action")
    assert(got == asSet(want), s"for generated SQL:\n$sql")
  }

  test("pg dialect semantics == CoalesceMerge, default rules + null keys") {
    val target = Seq((Option(1L), "alice", Option(1.0)),
      (Option(2L), "bob", Option(2.0))).toDF("k", "name", "score")
    val source = Seq(
      (Option(1L), Option.empty[String], Option(9.0)),
      (Option.empty[Long], Option("ghost"), Option(0.0)),
      (Option(3L), Option("carol"), Option(3.0)),
    ).toDF("k", "name", "score")
    pgParity(target, source, Seq("k"), Map.empty)
  }

  test("pg dialect semantics == CoalesceMerge, mixed + all-InsertOnly") {
    val target = Seq((1L, "alice", 1.0), (2L, "bob", 2.0))
      .toDF("k", "name", "score")
    val source = Seq(
      (1L, Option.empty[String], Option(9.0)),
      (2L, Option("robert"), Option.empty[Double]),
      (4L, Option("dave"), Option(4.0)),
    ).toDF("k", "name", "score")
    pgParity(target, source, Seq("k"),
      Map("name" -> Overwrite, "score" -> InsertOnly))
    pgParity(target, source, Seq("k"),
      Map("name" -> InsertOnly, "score" -> InsertOnly))
  }

  // ------------------------------------------------------------------
  // EXECUTED pg dialect: DuckDB speaks the Postgres ON CONFLICT syntax
  // (Derby doesn't), so the generated statement runs on a real engine
  // through the full pgUpsert JDBC path — closing the round-4 gap where
  // the dialect was proven only by template text + interpreter.
  // Source frames are coalesce(1)'d: DuckDB rejects concurrent write
  // transactions on one file, which is a property of the embedded test
  // engine, not of the per-partition connection fan-out (Postgres
  // serializes on the row locks instead).

  private def withDuck(body: String => Unit): Unit = {
    val db = java.nio.file.Files.createTempDirectory("graft-duck")
      .resolve("pg.duckdb").toString
    body(s"jdbc:duckdb:$db")
  }

  private def duckExec(durl: String, sqls: String*): Unit = {
    val conn = DriverManager.getConnection(durl)
    try {
      val st = conn.createStatement()
      try sqls.foreach(st.execute) finally st.close()
    } finally conn.close()
  }

  test("pg dialect EXECUTED on DuckDB: default rules — null never clobbers, " +
      "new keys insert") {
    withDuck { durl =>
      duckExec(durl,
        """CREATE TABLE pgexec ("k" BIGINT, "name" VARCHAR, "score" DOUBLE,
          | UNIQUE ("k"))""".stripMargin)
      val target = Seq((1L, "alice", 1.0), (2L, "bob", 2.0))
        .toDF("k", "name", "score")
      val source = Seq((2L, null.asInstanceOf[String], 9.0), (3L, "carol", 3.0))
        .toDF("k", "name", "score")
      JdbcMerge.pgUpsert(target.coalesce(1), durl, "\"pgexec\"", Seq("k"))
      JdbcMerge.pgUpsert(source.coalesce(1), durl, "\"pgexec\"", Seq("k"))
      val expected = CoalesceMerge.upsert(target, source, Seq("k"))
        .drop("_action")
      assert(asSet(spark.read.jdbc(durl, "\"pgexec\"", props)) ==
        asSet(expected))
    }
  }

  test("pg dialect EXECUTED on DuckDB: mixed rules and idempotent re-run") {
    withDuck { durl =>
      duckExec(durl,
        """CREATE TABLE pgmix ("k" BIGINT, "name" VARCHAR, "score" DOUBLE,
          | UNIQUE ("k"))""".stripMargin)
      val target = Seq((1L, "alice", 1.0), (2L, "bob", 2.0))
        .toDF("k", "name", "score")
      val source = Seq((1L, null.asInstanceOf[String], 7.0), (4L, "dan", 4.0))
        .toDF("k", "name", "score")
      val rules: Map[String, Rule] =
        Map("name" -> Overwrite, "score" -> InsertOnly)
      JdbcMerge.pgUpsert(target.coalesce(1), durl, "\"pgmix\"", Seq("k"))
      JdbcMerge.pgUpsert(source.coalesce(1), durl, "\"pgmix\"", Seq("k"), rules)
      val expected = CoalesceMerge.upsert(target, source, Seq("k"), rules)
        .drop("_action")
      assert(asSet(spark.read.jdbc(durl, "\"pgmix\"", props)) == asSet(expected))
      // re-running the same batch is a no-op state change (foreachBatch
      // replay contract), executed through the real engine
      JdbcMerge.pgUpsert(source.coalesce(1), durl, "\"pgmix\"", Seq("k"), rules)
      assert(asSet(spark.read.jdbc(durl, "\"pgmix\"", props)) == asSet(expected))
    }
  }

  test("pg dialect EXECUTED on DuckDB: all-InsertOnly DO NOTHING keeps " +
      "matched rows byte-identical") {
    withDuck { durl =>
      duckExec(durl,
        """CREATE TABLE pgnop ("k" BIGINT, "name" VARCHAR, "score" DOUBLE,
          | UNIQUE ("k"))""".stripMargin)
      val target = Seq((1L, "alice", 1.0)).toDF("k", "name", "score")
      val source = Seq((1L, "evil", 666.0), (2L, "new", 2.0))
        .toDF("k", "name", "score")
      val rules: Map[String, Rule] =
        Map("name" -> InsertOnly, "score" -> InsertOnly)
      JdbcMerge.pgUpsert(target.coalesce(1), durl, "\"pgnop\"", Seq("k"))
      JdbcMerge.pgUpsert(source.coalesce(1), durl, "\"pgnop\"", Seq("k"), rules)
      val expected = CoalesceMerge.upsert(target, source, Seq("k"), rules)
        .drop("_action")
      assert(asSet(spark.read.jdbc(durl, "\"pgnop\"", props)) == asSet(expected))
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
