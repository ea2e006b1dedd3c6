package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.conf.ExtractConfig
import graft.engine.Engine
import graft.meta.Catalog

/** Whole-engine flow as a registered query: seed SQL → driving-table
  * parse → FK/RK closure → config-driven sanitize, returning the
  * sanitized seed table (the reference's `extract` verb end-to-end,
  * minus the file sink which EngineSpec covers).
  */
object EngineQueries {

  private val config = ExtractConfig.fromJson(
    """{
      |  "locale": "fr",
      |  "schema": [{
      |    "table_name": "customer",
      |    "reference_keys": ["lineitem_orderkey_fkey"],
      |    "columns": [
      |      {"name": "c_name", "replace": "Customer#{c_custkey}"},
      |      {"name": "c_acctbal", "sanitize": true}
      |    ]
      |  }]
      |}""".stripMargin)

  def engineExtract(spark: SparkSession, dir: String): DataFrame = {
    val engine = new Engine(spark, Catalog.tpch,
      t => Tables(spark, dir, t), config)
    engine.extract("SELECT * FROM customer WHERE c_custkey <= 10")("customer")
      .orderBy("c_custkey")
  }

  val engineExtractSql: String =
    """SELECT c_custkey,
      |  'Customer#' || CAST(c_custkey AS VARCHAR) AS c_name,
      |  c_nationkey,
      |  CAST(NULL AS DOUBLE) AS c_acctbal,
      |  c_mktsegment
      |FROM customer
      |WHERE c_custkey <= 10
      |ORDER BY c_custkey""".stripMargin

  /** J3 — templated config queries as closure edges
    * (`/root/reference/etl/extractor.go:70-79`): reverse expansion is
    * suppressed (`omit_reference_keys`), so the ONLY way orders enter the
    * closure is the per-row `{c_custkey}` query — which also restricts to
    * status 'F', something no FK/RK edge can express. The pulled orders
    * then expand their own forward FKs as usual. Counted per table like
    * `closure_extract`.
    */
  private val j3Config = ExtractConfig.fromJson(
    """{
      |  "schema": [{
      |    "table_name": "customer",
      |    "omit_reference_keys": true,
      |    "queries": [{"table_name": "orders",
      |      "query": "SELECT * FROM orders WHERE o_custkey = {c_custkey} AND o_orderstatus = 'F'"}]
      |  }]
      |}""".stripMargin)

  /** Per-table row counts of an engine extract as ONE
    * union-of-aggregates plan (single job for all tables). */
  private def tableCounts(spark: SparkSession, dir: String,
      config: ExtractConfig, seedSql: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val engine = new Engine(spark, Catalog.tpch,
      t => Tables(spark, dir, t), config)
    engine.extract(seedSql).toSeq.sortBy(_._1)
      .map { case (t, df) =>
        df.agg(count(lit(1)).as("n_rows")).select(lit(t).as("table_name"), col("n_rows"))
      }
      .reduce(_.unionByName(_))
      .orderBy("table_name")
  }

  def closureConfigQuery(spark: SparkSession, dir: String): DataFrame =
    tableCounts(spark, dir, j3Config, "SELECT * FROM customer WHERE c_custkey <= 5")

  val closureConfigQuerySql: String =
    """WITH seed AS (SELECT * FROM customer WHERE c_custkey <= 5),
      |ords AS (SELECT * FROM orders
      |         WHERE o_custkey IN (SELECT c_custkey FROM seed) AND o_orderstatus = 'F'),
      |nat AS (SELECT * FROM nation WHERE n_nationkey IN (SELECT c_nationkey FROM seed)),
      |reg AS (SELECT * FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nat))
      |SELECT table_name, n_rows FROM (
      |  SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM seed UNION ALL
      |  SELECT 'orders', COUNT(*) FROM ords UNION ALL
      |  SELECT 'nation', COUNT(*) FROM nat UNION ALL
      |  SELECT 'region', COUNT(*) FROM reg
      |) ORDER BY table_name""".stripMargin

  /** S3 — full-table extras as SEEDS of the same traversal
    * (`/root/reference/etl/engine.go:117-125`): the whole supplier table
    * joins the closure (its FK chain nation→region rides along), with
    * supplier's reverse expansion omitted so the extra stays a bounded
    * dimension pull, not an every-lineitem avalanche. Counted per table
    * like the other engine queries; upgrades S3 from spec-only to the
    * hash-checked gate.
    */
  private val extrasConfig = ExtractConfig.fromJson(
    """{
      |  "extra": [{"table_name": "supplier"}],
      |  "schema": [{"table_name": "supplier", "omit_reference_keys": true}]
      |}""".stripMargin)

  def engineExtrasExtract(spark: SparkSession, dir: String): DataFrame =
    tableCounts(spark, dir, extrasConfig, "SELECT * FROM customer WHERE c_custkey <= 5")

  val engineExtrasExtractSql: String =
    """WITH seed AS (SELECT * FROM customer WHERE c_custkey <= 5),
      |ords AS (SELECT * FROM orders WHERE o_custkey IN (SELECT c_custkey FROM seed)),
      |evts AS (SELECT * FROM events WHERE user_id IN (SELECT c_custkey FROM seed)),
      |sup AS (SELECT * FROM supplier),
      |nat AS (SELECT * FROM nation WHERE n_nationkey IN (SELECT c_nationkey FROM seed)
      |                                OR n_nationkey IN (SELECT s_nationkey FROM sup)),
      |reg AS (SELECT * FROM region WHERE r_regionkey IN (SELECT n_regionkey FROM nat))
      |SELECT table_name, n_rows FROM (
      |  SELECT 'customer' AS table_name, COUNT(*) AS n_rows FROM seed UNION ALL
      |  SELECT 'orders', COUNT(*) FROM ords UNION ALL
      |  SELECT 'events', COUNT(*) FROM evts UNION ALL
      |  SELECT 'supplier', COUNT(*) FROM sup UNION ALL
      |  SELECT 'nation', COUNT(*) FROM nat UNION ALL
      |  SELECT 'region', COUNT(*) FROM reg
      |) ORDER BY table_name""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "engine_extract" -> ((engineExtract _, engineExtractSql)),
    "engine_extras_extract" -> ((engineExtrasExtract _, engineExtrasExtractSql)),
    "closure_config_query" -> ((closureConfigQuery _, closureConfigQuerySql))
  )
}
