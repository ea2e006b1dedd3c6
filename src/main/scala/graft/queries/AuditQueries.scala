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
  * key counts → LEFT ANTI against the parent's key column (broadcastable
  * for dim parents, shuffle for fact parents — Catalyst picks) → two
  * scalar rows cross-joined. Edges union; at 100 TB each edge audit is
  * independent and the union is a plan-level concat, not a shuffle.
  */
object AuditQueries {

  private[graft] def edgeAudit(spark: SparkSession, dir: String, e: FkEdge): DataFrame =
    edgeAuditDf(Tables(spark, dir, e.childTable), Tables(spark, dir, e.parentTable), e)

  /** The same audit over already-loaded frames — the CLI `check` verb's
    * entry point for artifact tables (where there is no table dir).
    */
  private[graft] def edgeAuditDf(childDf: DataFrame, parentDf: DataFrame, e: FkEdge): DataFrame = {
    val child = childDf
      .select(col(e.childCol).as("k")).filter(col("k").isNotNull)
    val parent = parentDf
      .select(col(e.parentCol).as("k"))
    val childKeys = child.groupBy("k").agg(count(lit(1)).as("n"))
    val orphans = childKeys.join(parent, Seq("k"), "left_anti")
      .agg(coalesce(sum("n"), lit(0L)).as("orphan_rows"),
        count(lit(1)).as("orphan_keys"))
    child.agg(count(lit(1)).as("child_rows"))
      .crossJoin(orphans) // two 1-row scalars
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
