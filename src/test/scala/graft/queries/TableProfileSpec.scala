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

  test("approx profile matches exact profile everywhere but NDV, which stays in the HLL envelope") {
    val orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    val exact = OlapQueries.tableProfileCore(orders).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = OlapQueries.tableProfileApproxCore(orders, uniqueCol = Some("o_orderkey"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(approx.keySet === exact.keySet)
    exact.foreach { case (c, e) =>
      val a = approx(c)
      // everything but n_distinct is computed identically → must be equal
      assert(a.getLong(1) === e.getLong(1), s"$c n_rows")
      assert(a.getLong(2) === e.getLong(2), s"$c n_nulls")
      assert(a.getString(4) === e.getString(4), s"$c min_str")
      assert(a.getString(5) === e.getString(5), s"$c max_str")
      // HLL++ at rsd 0.05: allow 3×rsd relative error (floor of 1 for
      // tiny cardinalities, where the sketch is in exact-count mode)
      val (nd, ndExact) = (a.getLong(3), e.getLong(3))
      val tol = math.max(0.15 * ndExact, 1.0)
      assert(math.abs(nd - ndExact) <= tol, s"$c approx NDV $nd vs exact $ndExact (tol $tol)")
    }
  }

  test("shipped table_profile plans WITHOUT Expand; exact form keeps it") {
    // logical Expand on the optimized plan: the physical ExpandExec hides
    // inside the un-executed AdaptiveSparkPlanExec wrapper under AQE
    def hasExpand(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collectWithSubqueries {
        case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
      }.nonEmpty
    val dir = "/root/testdata/sf0.001"
    assert(!hasExpand(OlapQueries.tableProfile(spark, dir)),
      "approx profile must not plan a rows×(ncols+1) Expand — that is the scale-killer it exists to avoid")
    assert(hasExpand(OlapQueries.tableProfileExact(spark, dir)),
      "exact profile is expected to plan the multi-distinct Expand (ANALYZE semantics)")
  }

  test("approx profile aborts when the unique-column NDV assertion is violated") {
    // a column falsely declared unique (o_orderstatus has 3 values over
    // 1.5k rows) must trip assert_true, not return silently-wrong rows
    val orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    val ex = intercept[Exception] {
      OlapQueries.tableProfileApproxCore(orders, uniqueCol = Some("o_orderstatus")).collect()
    }
    assert(ex.getMessage.contains("approx NDV outside envelope"))
  }
}
