package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.meta.{Catalog, FkEdge}

/** Referential-integrity audit — the verifier complement to the closure
  * extractor: the reference CONSTRUCTS referentially-consistent exports
  * (`/root/reference/etl/extractor.go:142-174`); this op CHECKS a set of
  * tables against the same catalog edges, reporting per-edge orphan
  * counts (child keys with no parent row). The audit every load target
  * wants before constraints are re-enabled, and every extracted artifact
  * wants as a gate.
  *
  * Shape per edge: one column-pruned child scan → partial-agg'd distinct
  * key counts → LEFT join against the parent's distinct key column
  * (broadcastable for dim parents, shuffle for fact parents — Catalyst
  * picks) → ONE aggregate yielding all three scalars. Edges union; at
  * 100 TB each edge audit is independent and the union is a plan-level
  * concat, not a shuffle.
  */
object AuditQueries {

  private[graft] def edgeAudit(spark: SparkSession, dir: String, e: FkEdge): DataFrame =
    edgeAuditDf(Tables(spark, dir, e.childTable), Tables(spark, dir, e.parentTable), e)

  /** The same audit over already-loaded frames — the CLI `check` verb's
    * entry point for artifact tables (where there is no table dir).
    * ONE child scan: child_rows, orphan_keys, and orphan_rows all fall
    * out of a single aggregate over the keyed counts left-joined to the
    * (distinct) parent keys — a separate child.count() would scan the
    * fact table a second time per edge.
    */
  private[graft] def edgeAuditDf(childDf: DataFrame, parentDf: DataFrame, e: FkEdge): DataFrame = {
    val childKeys = childDf
      .select(col(e.childCol).as("k")).filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("n"))
    val parentKeys = parentDf
      .select(col(e.parentCol).as("k")).distinct()
      .withColumn("p_hit", lit(1))
    childKeys.join(parentKeys, Seq("k"), "left")
      .agg(
        coalesce(sum("n"), lit(0L)).as("child_rows"),
        count(when(col("p_hit").isNull, 1)).as("orphan_keys"),
        coalesce(sum(when(col("p_hit").isNull, col("n"))), lit(0L)).as("orphan_rows"))
      .select(lit(e.name).as("edge"),
        lit(e.childTable).as("child_table"), lit(e.parentTable).as("parent_table"),
        col("child_rows"), col("orphan_keys"), col("orphan_rows"),
        (col("orphan_rows") === 0L).as("intact"))
  }

  def fkOrphans(spark: SparkSession, dir: String): DataFrame =
    Catalog.tpch.edges.sortBy(_.name)
      .map(e => edgeAudit(spark, dir, e))
      .reduce(_.unionByName(_))
      .orderBy("edge")

  val fkOrphansSql: String =
    Catalog.tpch.edges.sortBy(_.name).map { e =>
      s"""SELECT '${e.name}' AS edge,
         |  '${e.childTable}' AS child_table, '${e.parentTable}' AS parent_table,
         |  (SELECT COUNT(*) FROM ${e.childTable}
         |     WHERE ${e.childCol} IS NOT NULL) AS child_rows,
         |  (SELECT COUNT(*) FROM (
         |     SELECT ${e.childCol} AS k FROM ${e.childTable}
         |     WHERE ${e.childCol} IS NOT NULL GROUP BY 1) c
         |   WHERE NOT EXISTS (SELECT 1 FROM ${e.parentTable} p
         |     WHERE p.${e.parentCol} = c.k)) AS orphan_keys,
         |  (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
         |     SELECT ${e.childCol} AS k, COUNT(*) AS n FROM ${e.childTable}
         |     WHERE ${e.childCol} IS NOT NULL GROUP BY 1) c
         |   WHERE NOT EXISTS (SELECT 1 FROM ${e.parentTable} p
         |     WHERE p.${e.parentCol} = c.k)) AS orphan_rows,
         |  (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM (
         |     SELECT ${e.childCol} AS k, COUNT(*) AS n FROM ${e.childTable}
         |     WHERE ${e.childCol} IS NOT NULL GROUP BY 1) c
         |   WHERE NOT EXISTS (SELECT 1 FROM ${e.parentTable} p
         |     WHERE p.${e.parentCol} = c.k)) = 0 AS intact""".stripMargin
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY edge")

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "fk_orphans" -> ((fkOrphans _, fkOrphansSql))
  )
}
