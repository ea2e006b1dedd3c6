package graft.io

import org.apache.spark.sql.DataFrame
import java.sql.{Connection, DriverManager}

/** Upsert JDBC sink — the reference's load path
  * (`BulkInsert` `/root/reference/dialect/postgres/postgres.go:64-97`):
  * per-table transaction, triggers disabled, `INSERT … ON CONFLICT (pk)
  * DO NOTHING` per row, then sequence repair
  * (`resetSequence`, `postgres.go:499-523`).
  *
  * Differences by design:
  *  - the reference inserts row-at-a-time (`postgres.go:77-81`); this sink
  *    batches (`addBatch`/`executeBatch`) — the free win called out in
  *    SURVEY.md §4;
  *  - writes run per-partition in parallel (one txn per partition).
  *    Single-txn-per-table parity requires `df.coalesce(1)` — that is the
  *    documented scale-out tradeoff (SURVEY.md §7.4);
  *  - trigger toggling and `setval` are driver-side statements before /
  *    after the distributed write (they are DDL, not dataflow).
  *
  * SQL generation is pure and unit-tested; execution needs a live
  * Postgres (integration-gated — none in this container).
  */
object UpsertJdbcSink {

  /** `INSERT INTO t (c1, c2) VALUES (?, ?) ON CONFLICT (pk) DO NOTHING` —
    * shape from `postgres.go:472-475` (via loukoum in the reference).
    */
  def insertSql(table: String, columns: Seq[String], pk: String): String =
    s"""INSERT INTO "$table" (${columns.map(c => s""""$c"""").mkString(", ")})""" +
      s" VALUES (${columns.map(_ => "?").mkString(", ")})" +
      s""" ON CONFLICT ("$pk") DO NOTHING"""

  /** `ALTER TABLE t DISABLE/ENABLE TRIGGER ALL` (`postgres.go:483-497`). */
  def triggerSql(table: String, enable: Boolean): String =
    s"""ALTER TABLE "$table" ${if (enable) "ENABLE" else "DISABLE"} TRIGGER ALL"""

  /** Sequence repair statements (`postgres.go:499-523`): read the serial
    * sequence, then set it past MAX(pk) iff behind.
    */
  def sequenceNameSql(table: String, pk: String): String =
    s"SELECT pg_get_serial_sequence('$table', '$pk')"
  def maxPkSql(table: String, pk: String): String =
    s"""SELECT MAX("$pk") FROM "$table""""
  def setvalSql(seq: String, table: String, pk: String): String =
    s"""SELECT setval('$seq', COALESCE((SELECT MAX("$pk") FROM "$table") + 1, 1), false)"""

  /** Write `df` into `table` with upsert semantics. One connection + txn
    * per partition; triggers toggled and sequence repaired on the driver.
    */
  def write(df: DataFrame, url: String, props: java.util.Properties,
      table: String, pk: String, batchSize: Int = 1000): Unit = {
    val columns = df.schema.fieldNames.toSeq
    val sql = insertSql(table, columns, pk)

    withConnection(url, props) { c =>
      c.createStatement().execute(triggerSql(table, enable = false))
    }
    try {
      df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.nonEmpty) {
          val conn = DriverManager.getConnection(url, props)
          try {
            conn.setAutoCommit(false)
            val st = conn.prepareStatement(sql)
            var n = 0
            rows.foreach { r =>
              var i = 0
              while (i < columns.length) { st.setObject(i + 1, r.get(i)); i += 1 }
              st.addBatch(); n += 1
              if (n % batchSize == 0) st.executeBatch()
            }
            st.executeBatch()
            conn.commit()
          } catch {
            case e: Exception => conn.rollback(); throw e
          } finally conn.close()
        }
      }
    } finally {
      withConnection(url, props) { c =>
        c.createStatement().execute(triggerSql(table, enable = true))
        // sequence repair (no-op when the table has no serial sequence)
        val rs = c.createStatement().executeQuery(sequenceNameSql(table, pk))
        if (rs.next()) {
          val seq = rs.getString(1)
          if (seq != null) c.createStatement().execute(setvalSql(seq, table, pk))
        }
      }
    }
  }

  private def withConnection[T](url: String, props: java.util.Properties)
      (f: Connection => T): T = {
    val c = DriverManager.getConnection(url, props)
    try f(c) finally c.close()
  }
}
