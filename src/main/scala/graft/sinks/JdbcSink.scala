package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, Timestamp}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** JDBC sink with exactly-once semantics — the Spark-idiom analog of the
  * reference's XA two-phase-commit JDBC sink
  * (`xa-test/src/main/java/com/hazelcast/jet/contrib/xatests/JdbcXaTest.java:53-99`
  * validates that a PREPARED transaction survives client disconnect and can
  * be committed by a later connection; Jet's fault tolerance depends on it).
  *
  * Spark has no XA coordinator, but the same observable is achieved with
  * plain transactions + a batch-id ledger, the standard Spark
  * exactly-once-sink construction:
  *
  *  - '''stage''' (the XA `prepare` analog): each task writes its rows to a
  *    staging table tagged (epoch, partition) in its own transaction,
  *    DELETE-then-INSERT so task retries are idempotent. Staged rows are
  *    durably committed — they survive "disconnect" exactly like a prepared
  *    XA txn — but are not yet visible in the target table.
  *  - '''promote''' (the XA `commit` analog): ONE driver transaction moves
  *    the epoch's staged rows into the target table AND records the epoch
  *    in `graft_commits`. Atomic: a crash anywhere before COMMIT rolls back
  *    to "nothing promoted, marker absent", so the epoch replays; a replay
  *    of an already-recorded epoch is skipped wholesale. Task retries,
  *    epoch replays, and restarts all collapse to exactly-once target rows.
  *
  * Tested against embedded Derby (a real transactional JDBC engine, ships
  * with Spark); on a cluster the URL points at the warehouse —
  * `stageEpoch` runs on executors (one connection per partition, scales
  * with the data), `promoteEpoch` is a metadata-sized driver transaction.
  */
object JdbcSink {

  /** Ledger DDL: one row per promoted (query, epoch). */
  private val CommitsTable = "graft_commits"

  private def connect(url: String): Connection = {
    val c = DriverManager.getConnection(url)
    c.setAutoCommit(false)
    c
  }

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case BinaryType => "BLOB"
    case StringType => "VARCHAR(4000)"
    case other => throw new IllegalArgumentException(s"jdbcSink: unsupported type $other")
  }

  /** CREATE TABLE IF NOT EXISTS analog (Derby has no IF NOT EXISTS: swallow
    * the already-exists SQLState X0Y32). */
  private def ensure(c: Connection, ddl: String): Unit = {
    val st = c.createStatement()
    try { st.execute(ddl); c.commit() }
    catch {
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => c.rollback()
    } finally st.close()
  }

  private def ensureTables(url: String, table: String, schema: StructType): Unit = {
    val c = connect(url)
    try {
      val cols = schema.fields.map(f => s"${f.name} ${sqlType(f.dataType)}").mkString(", ")
      ensure(c, s"CREATE TABLE $table ($cols)")
      ensure(c, s"CREATE TABLE ${table}_stage (g_epoch BIGINT, g_part INTEGER, $cols)")
      ensure(c, s"CREATE TABLE $CommitsTable (query_id VARCHAR(256), epoch_id BIGINT, " +
        s"PRIMARY KEY (query_id, epoch_id))")
    } finally c.close()
  }

  private def bind(ps: PreparedStatement, i: Int, v: Any): Unit = v match {
    case null => ps.setObject(i, null)
    case x: Long => ps.setLong(i, x)
    case x: Int => ps.setInt(i, x)
    case x: Short => ps.setShort(i, x)
    case x: Double => ps.setDouble(i, x)
    case x: Float => ps.setFloat(i, x)
    case x: Boolean => ps.setBoolean(i, x)
    case x: Timestamp => ps.setTimestamp(i, x)
    case x: java.sql.Date => ps.setDate(i, x)
    case x: java.math.BigDecimal => ps.setBigDecimal(i, x)
    case x: BigDecimal => ps.setBigDecimal(i, x.bigDecimal)
    case x: Array[Byte] => ps.setBytes(i, x)
    case x: String => ps.setString(i, x)
    case other => ps.setObject(i, other)
  }

  /** Batch idempotent upsert by `keyCols`: one connection + transaction per
    * partition, UPDATE-else-INSERT per row batched on the wire. Re-running
    * the whole write (or a retried task re-running its partition) converges
    * to the same table — the batch-path idempotence story, no ledger
    * needed. Key columns must be non-null. */
  def jdbcUpsert(df: DataFrame, url: String, table: String, keyCols: Seq[String]): Unit = {
    val schema = df.schema
    require(keyCols.nonEmpty && keyCols.forall(k => schema.fieldNames.contains(k)),
      s"jdbcUpsert: keyCols $keyCols must be columns of ${schema.fieldNames.mkString(",")}")
    ensureTables(url, table, schema)
    val names = schema.fieldNames.toSeq
    val nonKey = names.filterNot(keyCols.contains)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val c = connect(url)
      try {
        val upd =
          if (nonKey.isEmpty) null
          else c.prepareStatement(s"UPDATE $table SET " +
            nonKey.map(n => s"$n = ?").mkString(", ") +
            " WHERE " + keyCols.map(k => s"$k = ?").mkString(" AND "))
        val del =
          if (nonKey.isEmpty)
            c.prepareStatement(s"DELETE FROM $table WHERE " +
              keyCols.map(k => s"$k = ?").mkString(" AND "))
          else null
        val ins = c.prepareStatement(
          s"INSERT INTO $table (${names.mkString(", ")}) VALUES (" +
            names.map(_ => "?").mkString(", ") + ")")
        rows.foreach { r =>
          val updated =
            if (nonKey.isEmpty) { // key-only table: upsert = delete+insert
              keyCols.zipWithIndex.foreach { case (k, i) =>
                bind(del, i + 1, r.get(r.fieldIndex(k))) }
              del.executeUpdate(); 0
            } else {
              nonKey.zipWithIndex.foreach { case (n, i) =>
                bind(upd, i + 1, r.get(r.fieldIndex(n))) }
              keyCols.zipWithIndex.foreach { case (k, i) =>
                bind(upd, nonKey.length + i + 1, r.get(r.fieldIndex(k))) }
              upd.executeUpdate()
            }
          if (updated == 0) {
            names.zipWithIndex.foreach { case (n, i) =>
              bind(ins, i + 1, r.get(r.fieldIndex(n))) }
            ins.executeUpdate()
          }
        }
        c.commit()
      } catch {
        case e: Throwable => try c.rollback() catch { case _: Throwable => }; throw e
      } finally c.close()
    }
  }

  /** Phase 1 (XA `prepare` analog): stage `df` for `epochId` — executors
    * write (epoch, partition)-tagged rows into `<table>_stage`, each
    * partition in its own DELETE-then-INSERT transaction so a retried task
    * attempt replaces, never duplicates, its slice. Durable after commit:
    * staged rows survive disconnect/restart, awaiting promotion. */
  def stageEpoch(df: DataFrame, url: String, table: String, epochId: Long): Unit = {
    val schema = df.schema
    ensureTables(url, table, schema)
    val names = schema.fieldNames.toSeq
    df.foreachPartition { (rows: Iterator[Row]) =>
      val part = Option(org.apache.spark.TaskContext.get())
        .map(_.partitionId()).getOrElse(0)
      val c = connect(url)
      try {
        val del = c.prepareStatement(
          s"DELETE FROM ${table}_stage WHERE g_epoch = ? AND g_part = ?")
        del.setLong(1, epochId); del.setInt(2, part)
        del.executeUpdate()
        val ins = c.prepareStatement(
          s"INSERT INTO ${table}_stage (g_epoch, g_part, ${names.mkString(", ")}) " +
            s"VALUES (?, ?, ${names.map(_ => "?").mkString(", ")})")
        var n = 0
        rows.foreach { r =>
          ins.setLong(1, epochId); ins.setInt(2, part)
          names.zipWithIndex.foreach { case (nm, i) =>
            bind(ins, i + 3, r.get(r.fieldIndex(nm))) }
          ins.addBatch()
          n += 1
          if (n % 512 == 0) ins.executeBatch()
        }
        ins.executeBatch()
        c.commit()
      } catch {
        case e: Throwable => try c.rollback() catch { case _: Throwable => }; throw e
      } finally c.close()
    }
  }

  /** Phase 2 (XA `commit` analog): promote `epochId`'s staged rows into the
    * target and record the epoch in the ledger — ONE driver transaction, so
    * target rows and the marker appear atomically. Returns false (no-op) if
    * the epoch was already promoted: replays are skipped wholesale. */
  def promoteEpoch(url: String, table: String, queryId: String, epochId: Long): Boolean = {
    val c = connect(url)
    try {
      val seen = c.prepareStatement(
        s"SELECT 1 FROM $CommitsTable WHERE query_id = ? AND epoch_id = ?")
      seen.setString(1, queryId); seen.setLong(2, epochId)
      val rs = seen.executeQuery()
      val already = rs.next()
      rs.close()
      if (already) {
        // replayed epoch: drop any re-staged rows, promote nothing
        val gc = c.prepareStatement(s"DELETE FROM ${table}_stage WHERE g_epoch = ?")
        gc.setLong(1, epochId); gc.executeUpdate()
        c.commit()
        false
      } else {
        val cols = stagedDataColumns(c, table)
        val mv = c.prepareStatement(
          s"INSERT INTO $table (${cols.mkString(", ")}) " +
            s"SELECT ${cols.mkString(", ")} FROM ${table}_stage WHERE g_epoch = ?")
        mv.setLong(1, epochId); mv.executeUpdate()
        val gc = c.prepareStatement(s"DELETE FROM ${table}_stage WHERE g_epoch = ?")
        gc.setLong(1, epochId); gc.executeUpdate()
        val mark = c.prepareStatement(s"INSERT INTO $CommitsTable VALUES (?, ?)")
        mark.setString(1, queryId); mark.setLong(2, epochId)
        mark.executeUpdate()
        c.commit()
        true
      }
    } catch {
      case e: Throwable => try c.rollback() catch { case _: Throwable => }; throw e
    } finally c.close()
  }

  /** XA `rollback` analog: drop an epoch's staged rows without promoting. */
  def abortEpoch(url: String, table: String, epochId: Long): Unit = {
    val c = connect(url)
    try {
      val gc = c.prepareStatement(s"DELETE FROM ${table}_stage WHERE g_epoch = ?")
      gc.setLong(1, epochId); gc.executeUpdate()
      c.commit()
    } finally c.close()
  }

  private def stagedDataColumns(c: Connection, table: String): Seq[String] = {
    val md = c.getMetaData.getColumns(null, null, table.toUpperCase, null)
    val b = Seq.newBuilder[String]
    while (md.next()) b += md.getString("COLUMN_NAME")
    md.close()
    b.result()
  }

  /** Exactly-once epoch write = stage + promote. Safe to call again for the
    * same (queryId, epochId) — the ledger makes the replay a no-op. */
  def writeEpochExactlyOnce(
      df: DataFrame, url: String, table: String, queryId: String, epochId: Long): Boolean = {
    stageEpoch(df, url, table, epochId)
    promoteEpoch(url, table, queryId, epochId)
  }

  /** `writeStream.foreachBatch` adapter: exactly-once per micro-batch,
    * batchId-keyed — recovery replays of a committed batch are skipped. */
  def foreachBatchExactlyOnce(
      url: String, table: String, queryId: String): (DataFrame, Long) => Unit =
    (df, batchId) => { writeEpochExactlyOnce(df, url, table, queryId, batchId); () }

  /** Read a sink table back through Spark's JDBC source (the check side of
    * the round-trip oracle; also how a downstream job would consume it). */
  def readTable(spark: org.apache.spark.sql.SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
}
