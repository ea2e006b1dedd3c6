package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Null/distinct/min-max semantics of [[OlapQueries.tableProfileCore]] on
  * a crafted table — the registered `table_profile` query runs over
  * null-free fixtures, so the null-counting and double-rendering paths
  * need their own gate.
  */
class TableProfileSpec extends SparkSpec {

  test("profile counts nulls, distincts, and renders doubles at 2dp") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType)))
    val rows = Seq(
      Row(1L, "a", 1.5),
      Row(2L, null, 2.25),
      Row(3L, "a", null),
      Row(4L, null, 10.0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val prof = OlapQueries.tableProfileCore(df).collect()
      .map(r => r.getString(0) -> r).toMap

    assert(prof("id").getLong(1) === 4L)       // n_rows
    assert(prof("id").getLong(2) === 0L)       // n_nulls
    assert(prof("id").getLong(3) === 4L)       // n_distinct
    assert(prof("id").getString(4) === "1")
    assert(prof("id").getString(5) === "4")

    assert(prof("name").getLong(2) === 2L)     // two nulls
    assert(prof("name").getLong(3) === 1L)     // distinct excludes nulls
    assert(prof("name").getString(4) === "a")

    assert(prof("score").getLong(2) === 1L)
    assert(prof("score").getLong(3) === 3L)
    assert(prof("score").getString(4) === "1.50")  // DECIMAL(18,2) render
    assert(prof("score").getString(5) === "10.00")
  }
}
