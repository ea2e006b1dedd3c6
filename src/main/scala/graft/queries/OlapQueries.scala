package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** OLAP surface beyond the reference (SURVEY.md §2.5/§2.6 extension
  * breadth): grouping sets, pivot, unpivot, percentiles, as-of join.
  * All shapes a user of a general analytics engine expects; each with a
  * DuckDB oracle.
  */
object OlapQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** ROLLUP over (priority, status): partial-aggregate hierarchy in one
    * shuffle (Spark expands grouping sets map-side).
    */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))
      .orderBy("priority", "status")
  }

  val rollupAggSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  /** Pivot: order counts per priority × status. Expressed as conditional
    * aggregation (identical plan shape to Spark's pivot, and the form the
    * oracle can replay exactly).
    */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame = {
    val statuses = Seq("F", "O", "P")
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_total"),
        statuses.map(s =>
          sum(when(col("o_orderstatus") === s, 1L).otherwise(0L)).as(s"n_$s")): _*)
      .orderBy("o_orderpriority")
  }

  val pivotAggSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Unpivot (melt): wide customer metrics → long (metric, value). */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "customer")
      .filter(col("c_custkey") <= 50)
      .select(col("c_custkey"),
        expr("""stack(2, 'acctbal', c_acctbal,
                         'nationkey', cast(c_nationkey AS double))
                AS (metric, value)"""))
      .orderBy("c_custkey", "metric")
  }

  val unpivotMetricsSql: String =
    """SELECT c_custkey, metric, value FROM (
      |  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
      |  UNION ALL
      |  SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer)
      |WHERE c_custkey <= 50
      |ORDER BY c_custkey, metric""".stripMargin

  /** Exact interpolated percentiles per group (median / p90). */
  def percentiles(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }

  val percentilesSql: String =
    """SELECT o_orderpriority,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** As-of join: for every click event, the most recent purchase at or
    * before it by the same user. Spark-first formulation: ONE sort per
    * user (window last-ignoring-nulls over the unioned stream) instead of
    * a range join — O(n log n), no pair blow-up, and the exact shape a
    * 100 TB engine wants (single shuffle on user_id). The oracle replays
    * the same window in DuckDB.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter(col("event_type").isin("click", "purchase"))
      .withColumn("last_purchase_ts",
        last(when(col("event_type") === "purchase", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_purchase_ts"))
      .orderBy("event_id")
  }

  val asofJoinSql: String =
    """SELECT event_id, user_id, ts, last_purchase_ts FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    MAX(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
      |  FROM events
      |  WHERE event_type IN ('click', 'purchase'))
      |WHERE event_type = 'click'
      |ORDER BY event_id""".stripMargin

  /** Top-k per group via the custom [[graft.functions.TopKByScore]]
    * TypedImperativeAggregate: one agg pass, k pairs shuffled per
    * (task, group) instead of the window's full-shuffle sort. The oracle
    * is the window formulation — the two algorithms must agree exactly.
    */
  def topkCustomAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TopKByScore.topk_by
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(topk_by(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("o_orderkey"),
        col("col.score").as("o_totalprice"))
      .orderBy("o_orderpriority", "rank")
  }

  val topkCustomAggSql: String =
    """SELECT o_orderpriority, CAST(rank AS INT) AS rank, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |  FROM orders)
      |WHERE rank <= 3
      |ORDER BY o_orderpriority, rank""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "topk_custom_agg" -> ((topkCustomAgg _, topkCustomAggSql)),
    "rollup_agg" -> ((rollupAgg _, rollupAggSql)),
    "pivot_agg" -> ((pivotAgg _, pivotAggSql)),
    "unpivot_metrics" -> ((unpivotMetrics _, unpivotMetricsSql)),
    "percentiles" -> ((percentiles _, percentilesSql)),
    "asof_join" -> ((asofJoin _, asofJoinSql))
  )
}
