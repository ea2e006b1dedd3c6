package graft.meta

/** Catalog model for the engine.
  *
  * Spark-native re-expression of the reference's dialect-agnostic catalog
  * (`/root/reference/dialect/dialect.go:23-99`): `Table{Name, PrimaryKeys,
  * Columns, ForeignKeys, ReferenceKeys}`. The reference introspects
  * pg_catalog at runtime (`/root/reference/dialect/postgres/postgres.go:334-403`);
  * on the parquet harness the catalog is declared statically, and the same
  * case classes can be hydrated from JDBC pg_catalog queries (see
  * [[graft.io.PgIntrospect]]).
  */
final case class ColumnMeta(name: String, dataType: String, nullable: Boolean = true, position: Int = 0)

/** A foreign-key edge: `childTable.childCol` references `parentTable.parentCol`.
  * Mirrors `dialect.ForeignKey` (`/root/reference/dialect/dialect.go:76-83`);
  * the reverse view of the same edge is the reference's `ReferenceKey`
  * (`dialect/dialect.go:94-99`). We store the edge once and derive both
  * directions.
  */
final case class FkEdge(
    name: String,
    childTable: String,
    childCol: String,
    parentTable: String,
    parentCol: String)

/** The reference assumes a single-column PK (`dialect.go:32-34`); we
  * generalize to composite keys (`primaryKey: Seq`) because real fact
  * tables (lineitem) need them to identify rows.
  */
final case class TableMeta(
    name: String,
    primaryKey: Seq[String],
    columns: Seq[ColumnMeta] = Nil)

final case class Catalog(tables: Map[String, TableMeta], edges: Seq[FkEdge]) {
  /** Forward FK edges out of `table` (child → parent lookups, ref J1). */
  def foreignKeysOf(table: String): Seq[FkEdge] = edges.filter(_.childTable == table)
  /** Reverse edges into `table` ("which tables point at me", ref J2). */
  def referenceKeysOf(table: String): Seq[FkEdge] = edges.filter(_.parentTable == table)
  def pkOf(table: String): Seq[String] = tables(table).primaryKey
}

object Catalog {
  /** Static catalog for the driver-generated TPC-H-ish testdata
    * (`/root/repo/FIXTURES.md` §A). Stands in for pg_catalog introspection.
    */
  val tpch: Catalog = Catalog(
    tables = Map(
      "region"   -> TableMeta("region", Seq("r_regionkey")),
      "nation"   -> TableMeta("nation", Seq("n_nationkey")),
      "customer" -> TableMeta("customer", Seq("c_custkey")),
      "supplier" -> TableMeta("supplier", Seq("s_suppkey")),
      "part"     -> TableMeta("part", Seq("p_partkey")),
      "orders"   -> TableMeta("orders", Seq("o_orderkey")),
      "lineitem" -> TableMeta("lineitem", Seq("l_orderkey", "l_linenumber")),
      "events"   -> TableMeta("events", Seq("event_id")),
      "documents" -> TableMeta("documents", Seq("doc_id")),
      "embeddings" -> TableMeta("embeddings", Seq("vec_id"))
    ),
    edges = Seq(
      FkEdge("lineitem_orderkey_fkey", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      FkEdge("lineitem_partkey_fkey", "lineitem", "l_partkey", "part", "p_partkey"),
      FkEdge("lineitem_suppkey_fkey", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      FkEdge("orders_custkey_fkey", "orders", "o_custkey", "customer", "c_custkey"),
      FkEdge("customer_nationkey_fkey", "customer", "c_nationkey", "nation", "n_nationkey"),
      FkEdge("supplier_nationkey_fkey", "supplier", "s_nationkey", "nation", "n_nationkey"),
      FkEdge("nation_regionkey_fkey", "nation", "n_regionkey", "region", "r_regionkey"),
      FkEdge("events_userid_fkey", "events", "user_id", "customer", "c_custkey")
    )
  )
}
