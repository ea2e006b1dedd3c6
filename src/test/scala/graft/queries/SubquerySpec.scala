package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins for the correlated-subquery tier: (1) Catalyst actually
  * decorrelates — the physical plans are joins + bounded aggregates,
  * never a per-outer-row subquery re-execution; (2) the SQL form equals
  * an explicit DataFrame-API decorrelation of the same semantics; (3)
  * the COUNT-bug case (zero-order customers must count 0, not NULL —
  * the classic wrong answer a naive outer-join translation produces) on
  * a planted fixture, since every synthetic customer has orders.
  */
class SubquerySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("corr_small_qty decorrelates to broadcast-joined aggregates") {
    val plan = SubqueryQueries.corrSmallQty(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // the correlated aggregates became grouped HashAggregates…
    assert(plan.contains("HashAggregate"))
    // …and lineitem is scanned a bounded 3× (outer + 2 subquery aggs),
    // independent of row count — not once per outer row
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 4, s"expected 4 scans (3 lineitem + 1 part), got $scans")
  }

  test("corr_small_qty == hand-decorrelated single-aggregate form") {
    val li = graft.Tables(spark, dir, "lineitem")
    val part = graft.Tables(spark, dir, "part")
    val perPart = li.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("bigint")).as("s"))
    val manual = li.join(perPart, "l_partkey")
      .filter(col("l_quantity").cast("bigint") * 5 * col("n") < col("s"))
      .join(part, col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_small"),
        sum(col("l_extendedprice").cast("decimal(18,4)"))
          .cast("double").as("revenue"))
      .orderBy("p_brand")
    // plan inspected BEFORE execution: a ran AdaptiveSparkPlan's toString
    // prints initial + final trees, double-counting scans
    val manualScans = "Scan parquet".r
      .findAllIn(manual.queryExecution.executedPlan.toString).size
    // the authored form saves a lineitem scan over the SQL plan's 4
    assert(manualScans == 3)
    val sqlForm = SubqueryQueries.corrSmallQty(spark, dir).collect().toSeq
    assert(sqlForm == manual.collect().toSeq)
  }

  test("corr_big_orders: IN rewrites to semi-join, top-k is TakeOrdered") {
    val plan = SubqueryQueries.corrBigOrders(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"))
    assert(plan.contains("TakeOrdered"))
  }

  test("lateral_topk decorrelates: one customer scan, no per-nation loop") {
    val df = SubqueryQueries.lateralTopk(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    val custScans = "customer.parquet".r.findAllIn(plan).size
    assert(custScans == 1, s"expected 1 customer scan, got $custScans")
    // equality with the explicit window formulation of the same top-2
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    val manual = graft.Tables(spark, dir, "customer")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .join(graft.Tables(spark, dir, "nation"),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"), col("c_custkey"),
        col("c_acctbal").cast("double").as("bal"))
      .orderBy(asc("n_name"), desc("bal"), asc("c_custkey"))
    assert(df.collect().toSeq == manual.collect().toSeq)
  }

  test("corr_min_cost keeps ALL suppliers tied at the exact minimum") {
    val tmp = java.nio.file.Files.createTempDirectory("subqmin").toString
    try {
      import spark.implicits._
      // part 1: suppliers 10 and 11 tie at total 5.00 (two rows summing
      // for 11 — the sum must be exact for the tie to register);
      // supplier 12 is higher. part 2: a single cheapest supplier.
      Seq(
        (1L, 10L, 5.00), (1L, 11L, 2.25), (1L, 11L, 2.75), (1L, 12L, 9.0),
        (2L, 20L, 1.0), (2L, 21L, 3.0))
        .toDF("l_partkey", "l_suppkey", "l_extendedprice")
        .write.parquet(s"$tmp/lineitem.parquet")
      val rows = SubqueryQueries.corrMinCost(spark, tmp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq((1L, 10L, 5.0), (1L, 11L, 5.0), (2L, 20L, 1.0)))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("exists_returned == explicit semi-join formulation") {
    val sql = SubqueryQueries.existsReturned(spark, dir).collect().toSeq
    val li = graft.Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    val manual = graft.Tables(spark, dir, "customer")
      .join(graft.Tables(spark, dir, "orders")
          .join(li, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .select("o_custkey").distinct(),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_returners"))
      .orderBy("c_nationkey")
    assert(sql == manual.collect().toSeq && sql.nonEmpty)
  }

  test("corr_idle_customers counts zero-order customers as 0, not NULL") {
    val tmp = java.nio.file.Files.createTempDirectory("subq").toString
    try {
      import spark.implicits._
      // customers 1-4 in one nation; 4 is wealthy with ZERO orders
      Seq((1L, 100.0, 7), (2L, 200.0, 7), (3L, 300.0, 7), (4L, 900.0, 7))
        .toDF("c_custkey", "c_acctbal", "c_nationkey")
        .write.parquet(s"$tmp/customer.parquet")
      // 3 has 9 orders (too active); 1, 2 have one each; 4 has none
      (Seq.fill(9)(3L) ++ Seq(1L, 2L)).zipWithIndex
        .map { case (ck, i) => (i.toLong, ck) }.toDF("o_orderkey", "o_custkey")
        .write.parquet(s"$tmp/orders.parquet")
      val rows = SubqueryQueries.corrIdleCustomers(spark, tmp).collect()
      // mean = 375: only 4 (900, zero orders) qualifies — and it MUST,
      // which fails if the correlated COUNT yields NULL instead of 0
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("n_idle") == 1L)
      assert(rows(0).getAs[Double]("total_bal") == 900.0)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("corr_late_supplier: EXISTS pair becomes semi+anti joins, == aggregate form") {
    val df = SubqueryQueries.corrLateSupplier(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    // the EXISTS became a left-semi, the NOT EXISTS a left-anti — with
    // the non-equi lateness predicate folded into the join, never a
    // per-outer-row subquery
    assert(plan.contains("LeftSemi"), "EXISTS did not rewrite to a semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS did not rewrite to an anti join")
    // hand-decorrelated per-order aggregate of the same semantics:
    // late lines in 'F' multi-supplier orders whose supplier is the
    // only late one
    val li = graft.Tables(spark, dir, "lineitem")
    val ord = graft.Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
    val perOrder = late.groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(col("is_late"), col("l_suppkey"))).as("n_late_supp"))
    val manual = late.filter(col("is_late"))
      .join(perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1),
        "l_orderkey")
      .join(graft.Tables(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), asc("s_name")).limit(20)
    assert(df.collect().toSeq == manual.collect().toSeq)
  }
}
