package graft.io

import java.sql.Connection
import scala.collection.mutable

import graft.meta.{Catalog, ColumnMeta, FkEdge, TableMeta}

/** pg_catalog introspection → [[graft.meta.Catalog]] — the reference's
  * startup catalog hydration (`dialect.Tables`,
  * `/root/reference/dialect/postgres/postgres.go:334-403`) with the same
  * batching shape: ONE query for all columns grouped client-side
  * (`postgres.go:349-366`), one pass each for PKs and FK edges.
  *
  * Runs on the driver over a plain JDBC connection (catalog metadata is
  * tiny; there is nothing to distribute). Integration-gated: exercised
  * against a live Postgres, not in the parquet harness, where
  * `Catalog.tpch` stands in.
  */
object PgIntrospect {

  /** All user tables (`postgres.go:334-346` shape). */
  val tablesSql: String =
    """SELECT c.relname
      |FROM pg_catalog.pg_class c
      |JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |WHERE c.relkind = 'r' AND n.nspname NOT IN ('pg_catalog', 'information_schema')
      |ORDER BY 1""".stripMargin

  /** All columns of all user tables in one query (`postgres.go:243-302`
    * semantics, grouped client-side).
    */
  val columnsSql: String =
    """SELECT c.relname, a.attname, format_type(a.atttypid, a.atttypmod),
      |       NOT a.attnotnull, a.attnum
      |FROM pg_catalog.pg_attribute a
      |JOIN pg_catalog.pg_class c ON c.oid = a.attrelid
      |JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |WHERE c.relkind = 'r' AND a.attnum > 0 AND NOT a.attisdropped
      |  AND n.nspname NOT IN ('pg_catalog', 'information_schema')
      |ORDER BY c.relname, a.attnum""".stripMargin

  /** Primary-key columns per table (`postgres.go:200-240` semantics). */
  val primaryKeysSql: String =
    """SELECT c.relname, a.attname, array_position(i.indkey, a.attnum)
      |FROM pg_catalog.pg_index i
      |JOIN pg_catalog.pg_class c ON c.oid = i.indrelid
      |JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
      |JOIN pg_catalog.pg_attribute a ON a.attrelid = c.oid AND a.attnum = ANY(i.indkey)
      |WHERE i.indisprimary
      |  AND n.nspname NOT IN ('pg_catalog', 'information_schema')
      |ORDER BY c.relname, 3""".stripMargin

  /** FK edges, both directions derivable (`postgres.go:100-176`: the
    * reference parses `pg_get_constraintdef` with a regex; the join on
    * `pg_constraint.conkey/confkey` is the structured form of the same
    * information — single-column FKs only, like the reference).
    */
  val foreignKeysSql: String =
    """SELECT con.conname, child.relname, a_child.attname,
      |       parent.relname, a_parent.attname
      |FROM pg_catalog.pg_constraint con
      |JOIN pg_catalog.pg_class child ON child.oid = con.conrelid
      |JOIN pg_catalog.pg_class parent ON parent.oid = con.confrelid
      |JOIN pg_catalog.pg_attribute a_child
      |  ON a_child.attrelid = child.oid AND a_child.attnum = con.conkey[1]
      |JOIN pg_catalog.pg_attribute a_parent
      |  ON a_parent.attrelid = parent.oid AND a_parent.attnum = con.confkey[1]
      |WHERE con.contype = 'f' AND array_length(con.conkey, 1) = 1
      |ORDER BY 1""".stripMargin

  /** Hydrate a [[Catalog]] from a live connection. */
  def introspect(conn: Connection): Catalog = {
    def query[T](sql: String)(f: java.sql.ResultSet => T): Seq[T] = {
      val rs = conn.createStatement().executeQuery(sql)
      val buf = mutable.ArrayBuffer.empty[T]
      while (rs.next()) buf += f(rs)
      buf.toSeq
    }
    val cols = query(columnsSql)(rs =>
      (rs.getString(1), ColumnMeta(rs.getString(2), rs.getString(3),
        rs.getBoolean(4), rs.getInt(5))))
      .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2) }
    val pks = query(primaryKeysSql)(rs => (rs.getString(1), rs.getString(2)))
      .groupBy(_._1).map { case (t, ps) => t -> ps.map(_._2) }
    val tables = query(tablesSql)(_.getString(1)).map { t =>
      t -> TableMeta(t, pks.getOrElse(t, Nil), cols.getOrElse(t, Nil))
    }.toMap
    val edges = query(foreignKeysSql)(rs =>
      FkEdge(rs.getString(1), rs.getString(2), rs.getString(3),
        rs.getString(4), rs.getString(5)))
    Catalog(tables, edges)
  }
}
