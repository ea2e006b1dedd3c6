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

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "engine_extract" -> ((engineExtract _, engineExtractSql))
  )
}
