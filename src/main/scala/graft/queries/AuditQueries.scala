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

  /** Declarative data-quality EXPECTATIONS (the dbt-test / Deequ
    * modality): not-null, unique-key, accepted-values, and value-range
    * checks declared as data and compiled to ONE conditional-aggregate
    * scan per table — check count never multiplies scans, the shape
    * that matters when the table is 100 TB (the unique check adds a
    * distinct aggregate to its table's pass; everything else is a
    * `sum(when(...))` riding the same scan). Each check emits
    * (check_name, table_name, column_name, n_rows, n_violations, pass);
    * violations of `accepted_values`/`in_range` are counted over
    * NON-NULL values only — nullability is `not_null`'s job. The clean
    * synthetic tables make every registered row pass; DqChecksSpec
    * plants nulls, duplicate keys, rogue values, and out-of-range rows
    * and pins the exact counts.
    */
  private[graft] sealed trait DqCheck {
    def name: String; def column: String
    def violations: org.apache.spark.sql.Column  // Spark aggregate expr
    def violationsSql: String                    // DuckDB aggregate expr
  }
  private[graft] final case class NotNull(column: String) extends DqCheck {
    val name = "not_null"
    def violations = sum(when(col(column).isNull, 1L).otherwise(0L))
    def violationsSql = s"SUM(CASE WHEN $column IS NULL THEN 1 ELSE 0 END)"
  }
  private[graft] final case class UniqueKey(column: String) extends DqCheck {
    val name = "unique_key"
    def violations = count(col(column)) - countDistinct(col(column))
    def violationsSql = s"COUNT($column) - COUNT(DISTINCT $column)"
  }
  private[graft] final case class AcceptedValues(column: String,
      values: Seq[String]) extends DqCheck {
    val name = "accepted_values"
    def violations = sum(when(col(column).isNotNull &&
      !col(column).isin(values: _*), 1L).otherwise(0L))
    def violationsSql = {
      val in = values.map(v => s"'$v'").mkString(", ")
      s"SUM(CASE WHEN $column IS NOT NULL AND $column NOT IN ($in) THEN 1 ELSE 0 END)"
    }
  }
  private[graft] final case class InRange(column: String, lo: Double,
      hi: Double) extends DqCheck {
    val name = "in_range"
    def violations = sum(when(col(column).isNotNull &&
      (col(column) < lo || col(column) > hi), 1L).otherwise(0L))
    def violationsSql =
      s"SUM(CASE WHEN $column IS NOT NULL AND ($column < $lo OR $column > $hi) THEN 1 ELSE 0 END)"
  }

  private[graft] val dqSuite: Seq[(String, Seq[DqCheck])] = Seq(
    "customer" -> Seq(NotNull("c_custkey"), UniqueKey("c_custkey"),
      NotNull("c_name")),
    "orders" -> Seq(NotNull("o_custkey"),
      AcceptedValues("o_orderstatus", Seq("F", "O", "P"))),
    "lineitem" -> Seq(InRange("l_quantity", 1, 50),
      InRange("l_discount", 0.0, 0.1)),
    "events" -> Seq(UniqueKey("event_id"), NotNull("value")))

  /** One table's checks as one scan: the conditional aggregates compute
    * side by side, then `stack` unpivots the single result row to one
    * row per check.
    */
  private[graft] def dqAudit(df: DataFrame, table: String,
      checks: Seq[DqCheck]): DataFrame = {
    val agg = df.agg(count(lit(1)).as("n_rows"),
      checks.zipWithIndex.map { case (c, i) =>
        coalesce(c.violations, lit(0L)).cast("long").as(s"v$i") }: _*)
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.name}', '${c.column}', v$i" }
      .mkString(", ")
    agg.select(
        expr(s"stack(${checks.size}, $stackArgs) AS (check_name, column_name, n_violations)"),
        col("n_rows"))
      .select(col("check_name"), lit(table).as("table_name"),
        col("column_name"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  def dqChecks(spark: SparkSession, dir: String): DataFrame =
    dqSuite.map { case (t, checks) =>
      dqAudit(Tables(spark, dir, t), t, checks) }
      .reduce(_.unionByName(_))
      .orderBy("table_name", "check_name", "column_name")

  val dqChecksSql: String =
    dqSuite.flatMap { case (t, checks) =>
      checks.map { c =>
        s"""SELECT '${c.name}' AS check_name, '$t' AS table_name,
           |  '${c.column}' AS column_name,
           |  (SELECT COUNT(*) FROM $t) AS n_rows,
           |  (SELECT CAST(COALESCE(${c.violationsSql}, 0) AS BIGINT) FROM $t)
           |    AS n_violations,
           |  (SELECT CAST(COALESCE(${c.violationsSql}, 0) AS BIGINT) FROM $t) = 0
           |    AS pass""".stripMargin
      }
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY table_name, check_name, column_name")

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "fk_orphans" -> ((fkOrphans _, fkOrphansSql)),
    "dq_checks" -> ((dqChecks _, dqChecksSql))
  )
}
