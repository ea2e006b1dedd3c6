package graft.io

import java.sql.{Connection, DatabaseMetaData, ResultSet}
import scala.collection.mutable

import graft.meta.{Catalog, ColumnMeta, FkEdge, TableMeta}

/** Catalog introspection over standard JDBC `DatabaseMetaData` — the
  * dialect-AGNOSTIC form of the reference's pg_catalog startup hydration
  * (`dialect.Tables`, `/root/reference/dialect/postgres/postgres.go:334-403`).
  * [[PgIntrospect]] keeps the reference's exact pg_catalog SQL for
  * Postgres parity; this one runs against ANY JDBC source (and is
  * executed in tests against embedded Derby: tables, composite PKs, FK
  * edges from `getImportedKeys` — the live-database path the reference's
  * `describe`/`extract` depend on).
  *
  * Driver-side only: catalog metadata is tiny, nothing to distribute.
  */
object JdbcIntrospect {

  /** Hydrate a [[Catalog]] from a live connection.
    * `schemaPattern` narrows to one schema (e.g. Derby's default "APP");
    * null means all non-system schemas the driver reports.
    */
  def introspect(conn: Connection, schemaPattern: String = null): Catalog = {
    val md = conn.getMetaData
    def collect[T](rs: ResultSet)(f: ResultSet => T): Seq[T] = {
      val buf = mutable.ArrayBuffer.empty[T]
      try { while (rs.next()) buf += f(rs) } finally rs.close()
      buf.toSeq
    }

    val tableNames = collect(md.getTables(null, schemaPattern, "%",
      Array("TABLE")))(_.getString("TABLE_NAME"))

    val tables = tableNames.map { t =>
      val cols = collect(md.getColumns(null, schemaPattern, t, "%")) { rs =>
        ColumnMeta(rs.getString("COLUMN_NAME"), rs.getString("TYPE_NAME"),
          rs.getInt("NULLABLE") != DatabaseMetaData.columnNoNulls,
          rs.getInt("ORDINAL_POSITION"))
      }.sortBy(_.position)
      val pk = collect(md.getPrimaryKeys(null, schemaPattern, t)) { rs =>
        (rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME"))
      }.sortBy(_._1).map(_._2)
      t -> TableMeta(t, pk, cols)
    }.toMap

    // single-column FKs only, like the reference (`postgres.go:137-176`
    // regex handles one column) — a multi-column FK is dropped whole, not
    // truncated to its first column (which would corrupt the join)
    val rawFks = tableNames.flatMap { t =>
      collect(md.getImportedKeys(null, schemaPattern, t)) { rs =>
        (Option(rs.getString("FK_NAME")).getOrElse(s"${t}_fk"),
          rs.getString("FKTABLE_NAME"), rs.getString("FKCOLUMN_NAME"),
          rs.getString("PKTABLE_NAME"), rs.getString("PKCOLUMN_NAME"))
      }
    }
    val edges = rawFks.groupBy(f => (f._1, f._2)).valuesIterator
      .filter(_.size == 1).map(_.head)
      .map(f => FkEdge(f._1, f._2, f._3, f._4, f._5))
      .toSeq.sortBy(_.name)

    Catalog(tables, edges)
  }
}
