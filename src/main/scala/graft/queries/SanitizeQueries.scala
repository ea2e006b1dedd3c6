package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sanitize.{ColumnRule, Sanitizer}

/** Sanitization operators as registered queries (SURVEY.md §2.8 F1–F4).
  * Both are hash-checked: `sanitize_customer` (replace-template +
  * null-out) against plain SQL, and `fake_customer` against a DuckDB
  * replay of the md5-seeded faker GENERATED from the same pools (see
  * [[fakeCustomerSql]]); SanitizerSpec covers determinism/uniqueness.
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
    * (F3). The faker's seed is the cross-engine md5 bridge, so the DuckDB
    * oracle replays every generated value bit-for-bit — the fake pipeline
    * is hash-checked end-to-end, not just rows-counted. SanitizerSpec
    * additionally asserts determinism + uniqueness.
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

  /** DuckDB replay of the faker, GENERATED from the same
    * [[graft.sanitize.Faker]] pools the Spark expressions use — the two
    * sides cannot drift. Same seed bridge as the dedup oracles:
    * `CAST(('0x' || substr(md5(salt:pk), 1, 15)) AS BIGINT) % n`.
    */
  val fakeCustomerSql: String = {
    val t = graft.sanitize.Faker.tables("fr")
    def list(pool: Seq[String]): String =
      pool.map(s => "'" + s.replace("'", "''") + "'").mkString("[", ", ", "]")
    def pick(pool: Seq[String], salt: String): String =
      s"${list(pool)}[CAST(CAST(('0x' || substr(md5('$salt:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % ${pool.size} AS INT) + 1]"
    val name = s"${pick(t.firstNames, "first_name")} || ' ' || ${pick(t.lastNames, "last_name")}"
    val emailBase = s"lower(${pick(t.firstNames, "email_l")}) || '.' || " +
      s"lower(${pick(t.lastNames, "email_r")}) || '@' || ${pick(t.emailDomains, "email_d")}"
    val email = s"replace($emailBase, '@', '.' || CAST(c_custkey AS VARCHAR) || '@')"
    val phone = s"'${t.phonePrefix}' || lpad(CAST(CAST(('0x' || substr(md5('phone:' || CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT) % 100000000 AS VARCHAR), 8, '0') || '-' || CAST(c_custkey AS VARCHAR)"
    s"""SELECT c_custkey,
      |  $name AS c_name,
      |  c_mktsegment,
      |  $email AS c_email,
      |  $phone AS c_phone
      |FROM customer
      |ORDER BY c_custkey""".stripMargin
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "sanitize_customer" -> ((sanitizeCustomer _, sanitizeCustomerSql)),
    "fake_customer" -> ((fakeCustomer _, fakeCustomerSql))
  )
}
