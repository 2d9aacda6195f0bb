package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement, Types}
import java.util.Properties

import graft.dims.CoalesceMerge
import graft.dims.CoalesceMerge.{CoalesceNewWins, InsertOnly, Overwrite, Rule}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** JDBC form of the warehouse merge (reference: the loader's Postgres
  * `INSERT ... ON CONFLICT` upserts, src/loader/service.py:1052-1132 and
  * src/shared/db/database.py:57-218): the SAME per-column
  * [[CoalesceMerge.Rule]] contract as the managed-parquet
  * [[CoalesceMerge.upsert]], executed against an external RDBMS.
  *
  * Execution shape, designed for a 1000-executor cluster:
  *  - the source is deduplicated per key FIRST
  *    ([[CoalesceMerge.dedupDeterministic]] — one shuffle), then written
  *    from `foreachPartition`: every executor opens one connection and
  *    streams its partition through JDBC batches. No driver-side
  *    collect; the driver holds nothing.
  *  - per batch the upsert is the portable two-phase form: a batched
  *    UPDATE whose SET clause encodes the column rules, then a batched
  *    INSERT of exactly the rows whose update count came back 0.
  *    `executeBatch`'s per-row counts make the routing exact, and the
  *    dedup guarantees a key appears once per run, so the two phases
  *    cannot race with themselves. Works on any ANSI JDBC store (Derby,
  *    H2, Postgres, ...) — no dialect-specific MERGE / ON CONFLICT.
  *  - single-writer semantics, like the reference's batch loader: two
  *    concurrent upserts of the SAME key can both insert; run merges of
  *    one target table serially (the reference's scheduler already does).
  *
  * Rule parity with [[CoalesceMerge.upsert]] (proven rule-for-rule in
  * JdbcMergeSpec against embedded Derby):
  *  - InsertOnly: matched rows keep every target value (the column is
  *    omitted from SET);
  *  - CoalesceNewWins (default): `SET c = COALESCE(?, c)` — non-null
  *    source wins, nulls never clobber;
  *  - Overwrite: `SET c = ?`;
  *  - null keys never match (`WHERE k = ?` is UNKNOWN on null), so a
  *    null-key source row inserts — same as the parquet merge's plain
  *    equality join.
  */
object JdbcMerge {

  /** Upsert `source` into JDBC `table` on `keys` under per-column rules.
    * Key columns are never updated. Non-key source columns must exist in
    * the target table. */
  def upsert(source: DataFrame, url: String, table: String,
             keys: Seq[String],
             rules: Map[String, Rule] = Map.empty,
             props: Properties = new Properties,
             batchSize: Int = 500,
             dedupSource: Boolean = true): Unit = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(keys.forall(source.columns.contains),
      s"key columns ${keys.filterNot(source.columns.contains).mkString(",")} " +
        "missing from source")
    val src = if (dedupSource) CoalesceMerge.dedupDeterministic(source, keys)
              else source
    val schema = src.schema
    val valueCols = schema.fieldNames.filterNot(keys.contains).toSeq
    val updatable = valueCols.filterNot(c =>
      rules.getOrElse(c, CoalesceNewWins) == InsertOnly)

    // UPDATE t SET <rule-encoded assignments> WHERE k1 = ? AND ...; when
    // every value column is InsertOnly the SET is a no-op key
    // self-assignment — the statement still reports "1 row" for matched
    // keys, which is exactly the probe the insert phase needs
    val setClause =
      if (updatable.isEmpty) s"${q(keys.head)} = ${q(keys.head)}"
      else updatable.map { c =>
        rules.getOrElse(c, CoalesceNewWins) match {
          case CoalesceNewWins => s"${q(c)} = COALESCE(?, ${q(c)})"
          case Overwrite       => s"${q(c)} = ?"
          case InsertOnly      => sys.error("unreachable")
        }
      }.mkString(", ")
    val updateSql = s"UPDATE $table SET $setClause WHERE " +
      keys.map(k => s"${q(k)} = ?").mkString(" AND ")
    val insertCols = schema.fieldNames.toSeq
    val insertSql = s"INSERT INTO $table (${insertCols.map(q).mkString(", ")}) " +
      s"VALUES (${insertCols.map(_ => "?").mkString(", ")})"

    val propsMap = {
      // Properties is not serializable-friendly across closures; ship a Map
      val it = props.stringPropertyNames().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val k = it.next(); b += k -> props.getProperty(k) }
      b.result()
    }
    val updateParamCols = updatable
    val keyCols = keys
    val bs = batchSize

    src.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = new Properties()
        propsMap.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, p)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          try {
            rows.grouped(bs).foreach { chunk =>
              // phase 1: batched rule-encoded UPDATE
              chunk.foreach { row =>
                var i = 1
                updateParamCols.foreach { c =>
                  bind(upd, i, row, schema.fieldIndex(c), schema); i += 1
                }
                keyCols.foreach { k =>
                  bind(upd, i, row, schema.fieldIndex(k), schema); i += 1
                }
                upd.addBatch()
              }
              val counts = upd.executeBatch()
              // the routing below needs REAL per-row counts: a driver
              // returning SUCCESS_NO_INFO (-2, e.g. Postgres with
              // rewritten batches) would silently classify every row as
              // "matched" and drop its insert, and one reporting
              // EXECUTE_FAILED (-3) without throwing would silently drop
              // the failed row from both paths — reject ANY negative
              // count loudly instead (fix: disable batch rewriting for
              // the merge connection / surface the row failure)
              require(!counts.exists(_ < 0),
                "JdbcMerge needs real per-row update counts from " +
                  "executeBatch; this driver returned " +
                  counts.filter(_ < 0).distinct.mkString(",") +
                  " — disable batch rewriting on the merge connection")
              // phase 2: batched INSERT of the update-count-0 rows
              var anyInsert = false
              chunk.zip(counts).foreach { case (row, n) =>
                if (n == 0) {
                  insertCols.zipWithIndex.foreach { case (c, j) =>
                    bind(ins, j + 1, row, schema.fieldIndex(c), schema)
                  }
                  ins.addBatch()
                  anyInsert = true
                }
              }
              if (anyInsert) ins.executeBatch()
              conn.commit()
            }
          } finally { upd.close(); ins.close() }
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw e
        } finally conn.close()
      }
    }
  }

  /** Postgres-dialect single-statement form of the SAME merge contract
    * (reference: the loader's `INSERT ... ON CONFLICT (keys) DO UPDATE
    * SET c = COALESCE(EXCLUDED.c, t.c)` upserts,
    * src/loader/service.py:342-361,577-623): one round trip per row
    * batch instead of the portable UPDATE-then-INSERT two phases. Rule
    * encoding, proven equivalent to the ANSI form's in
    * JdbcMergeSpec's dialect tests:
    *  - InsertOnly: the column is omitted from DO UPDATE SET (matched
    *    rows keep every target value); ALL value columns InsertOnly →
    *    `DO NOTHING`;
    *  - CoalesceNewWins: `c = COALESCE(EXCLUDED.c, t.c)`;
    *  - Overwrite: `c = EXCLUDED.c`.
    * Key columns are never assigned. The conflict target is the key
    * tuple, so like the two-phase form a null key never conflicts (a
    * unique index treats NULLs as distinct) and the row inserts. */
  def pgOnConflictSql(table: String, columns: Seq[String],
                      keys: Seq[String],
                      rules: Map[String, Rule] = Map.empty): String = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(keys.forall(columns.contains),
      s"key columns ${keys.filterNot(columns.contains).mkString(",")} " +
        "missing from column list")
    val valueCols = columns.filterNot(keys.contains)
    val updatable = valueCols.filterNot(c =>
      rules.getOrElse(c, CoalesceNewWins) == InsertOnly)
    val action =
      if (updatable.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + updatable.map { c =>
        rules.getOrElse(c, CoalesceNewWins) match {
          case CoalesceNewWins =>
            s"${q(c)} = COALESCE(EXCLUDED.${q(c)}, $table.${q(c)})"
          case Overwrite  => s"${q(c)} = EXCLUDED.${q(c)}"
          case InsertOnly => sys.error("unreachable")
        }
      }.mkString(", ")
    s"INSERT INTO $table (${columns.map(q).mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keys.map(q).mkString(", ")}) $action"
  }

  /** Execute the Postgres-dialect upsert: same distribution shape as
    * [[upsert]] (per-key dedup shuffle, then one connection per
    * partition streaming JDBC batches), but each row is ONE
    * `INSERT ... ON CONFLICT` statement — half the round trips and no
    * reliance on per-row update counts. Requires a store that speaks
    * the Postgres dialect; the offline test suite proves the generated
    * SQL's rule encoding against the ANSI form instead of executing it
    * (Derby has no ON CONFLICT). */
  def pgUpsert(source: DataFrame, url: String, table: String,
               keys: Seq[String],
               rules: Map[String, Rule] = Map.empty,
               props: Properties = new Properties,
               batchSize: Int = 500,
               dedupSource: Boolean = true): Unit = {
    val src = if (dedupSource) CoalesceMerge.dedupDeterministic(source, keys)
              else source
    val schema = src.schema
    val sql = pgOnConflictSql(table, schema.fieldNames.toSeq, keys, rules)
    val cols = schema.fieldNames.toSeq
    val propsMap = {
      val it = props.stringPropertyNames().iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val k = it.next(); b += k -> props.getProperty(k) }
      b.result()
    }
    val bs = batchSize
    src.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val p = new Properties()
        propsMap.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = DriverManager.getConnection(url, p)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(sql)
          try {
            rows.grouped(bs).foreach { chunk =>
              chunk.foreach { row =>
                cols.zipWithIndex.foreach { case (c, j) =>
                  bind(ps, j + 1, row, schema.fieldIndex(c), schema)
                }
                ps.addBatch()
              }
              ps.executeBatch()
              conn.commit()
            }
          } finally ps.close()
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw e
        } finally conn.close()
      }
    }
  }

  /** Structured-Streaming adapter: `stream.writeStream.foreachBatch(
    * JdbcMerge.foreachBatchUpsert(url, table, keys, rules))` gives the
    * reference's daily-run shape (micro-batch -> warehouse upsert) with
    * exactly-once-per-key effects per batch (the upsert is idempotent:
    * replaying a batch re-applies the same assignments). */
  def foreachBatchUpsert(url: String, table: String, keys: Seq[String],
                         rules: Map[String, Rule] = Map.empty,
                         props: Properties = new Properties)
      : (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => upsert(batch, url, table, keys, rules, props)

  /** Partition-parallel JDBC scan template: every executor reads one
    * stride of `partitionColumn` — the form a 100 TB-adjacent warehouse
    * pull needs (a plain `spark.read.jdbc(url, table)` is one executor,
    * one connection, one thread). Bounds come from the caller (a cheap
    * MIN/MAX on an indexed column) rather than a blind scan here. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long,
                      upperBound: Long, numPartitions: Int,
                      props: Properties = new Properties): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props)

  private def q(ident: String): String = "\"" + ident + "\""

  /** Bind one Row field to a PreparedStatement slot with an explicit
    * SQL type for nulls (setObject(null) is driver-dependent). */
  private def bind(ps: PreparedStatement, slot: Int, row: Row,
                   field: Int, schema: StructType): Unit = {
    val dt = schema.fields(field).dataType
    if (row.isNullAt(field)) ps.setNull(slot, sqlType(dt))
    else dt match {
      case LongType      => ps.setLong(slot, row.getLong(field))
      case IntegerType   => ps.setInt(slot, row.getInt(field))
      case ShortType     => ps.setShort(slot, row.getShort(field))
      case ByteType      => ps.setByte(slot, row.getByte(field))
      case DoubleType    => ps.setDouble(slot, row.getDouble(field))
      case FloatType     => ps.setFloat(slot, row.getFloat(field))
      case BooleanType   => ps.setBoolean(slot, row.getBoolean(field))
      case StringType    => ps.setString(slot, row.getString(field))
      case _: DecimalType => ps.setBigDecimal(slot, row.getDecimal(field))
      case TimestampType => ps.setTimestamp(slot, row.getTimestamp(field))
      case DateType      => ps.setDate(slot, row.getDate(field))
      case BinaryType    => ps.setBytes(slot, row.getAs[Array[Byte]](field))
      case other => throw new IllegalArgumentException(
        s"JdbcMerge: unsupported column type $other")
    }
  }

  private def sqlType(dt: DataType): Int = dt match {
    case LongType       => Types.BIGINT
    case IntegerType    => Types.INTEGER
    case ShortType      => Types.SMALLINT
    case ByteType       => Types.TINYINT
    case DoubleType     => Types.DOUBLE
    case FloatType      => Types.REAL
    case BooleanType    => Types.BOOLEAN
    case StringType     => Types.VARCHAR
    case _: DecimalType => Types.DECIMAL
    case TimestampType  => Types.TIMESTAMP
    case DateType       => Types.DATE
    case BinaryType     => Types.BINARY
    case _              => Types.OTHER
  }
}
