package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a testdata dir; `oracleSql` holds the DuckDB-dialect
  * equivalent the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship operation is the referentially-closed
    * subgraph extraction (`/root/reference/etl/extractor.go:142-174`) —
    * per-table row counts of the closure seeded from 10 customers.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.CoreQueries.closureExtract(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver records a weaker
    * rows-only check.
    */
  def oracleSql: Map[String, String] = graft.queries.Registry.oracleSql
}
