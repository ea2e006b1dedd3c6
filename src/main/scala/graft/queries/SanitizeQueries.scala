package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sanitize.{ColumnRule, Sanitizer}

/** Sanitization operators as registered queries (SURVEY.md §2.8 F1–F4).
  * `sanitize_customer` (replace-template + null-out) is SQL-expressible →
  * DuckDB oracle; `fake_customer` (deterministic seeded faker) is not →
  * rows-only check, with its invariants covered by SanitizerSpec.
  */
object SanitizeQueries {

  /** Replace-template + null-out rules over customer (F1 + F4). */
  def sanitizeCustomer(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
    Sanitizer(cust, Seq(
        ColumnRule("c_name", replace = Some("Customer#{c_custkey}")),
        ColumnRule("c_acctbal", sanitize = true)),
      pkCol = "c_custkey")
      .orderBy("c_custkey")
  }

  val sanitizeCustomerSql: String =
    """SELECT c_custkey,
      |  'Customer#' || CAST(c_custkey AS VARCHAR) AS c_name,
      |  c_nationkey,
      |  CAST(NULL AS DOUBLE) AS c_acctbal,
      |  c_mktsegment
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Deterministic pk-seeded fakes (F2) with uniqueness by construction
    * (F3). Not SQL-expressible (xxhash64 seeding) → no oracle; the driver
    * records a rows-only check and SanitizerSpec asserts determinism +
    * uniqueness.
    */
  def fakeCustomer(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_mktsegment")
      .withColumn("c_email", lit("x@y"))
      .withColumn("c_phone", lit("0"))
    Sanitizer(cust, Seq(
        ColumnRule("c_name", fake = Some("name")),
        ColumnRule("c_email", fake = Some("email"), unique = true),
        ColumnRule("c_phone", fake = Some("phone_number"), unique = true)),
      pkCol = "c_custkey", locale = "fr")
      .orderBy("c_custkey")
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "sanitize_customer" -> ((sanitizeCustomer _, sanitizeCustomerSql)),
    "fake_customer" -> ((fakeCustomer _, null))
  )
}
