package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.SparkSpec

/** The bucketed layout's whole point is a PLAN property: a join on the
  * bucket key must read both sides co-located, with no runtime shuffle
  * under the join — while the identical join on raw parquet exchanges
  * both sides. Results must also be value-identical between the two
  * paths (the layout is an optimization, never a semantics change).
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def joinNode(df: org.apache.spark.sql.DataFrame): SortMergeJoinExec = {
    df.queryExecution.executedPlan.collectFirst { case j: SortMergeJoinExec => j }
      .getOrElse(fail("expected a SortMergeJoin in:\n" +
        df.queryExecution.executedPlan))
  }

  private def shufflesUnder(p: org.apache.spark.sql.execution.SparkPlan): Int =
    p.collect { case _: ShuffleExchangeExec => 1 }.sum

  test("bucketed join: zero exchanges under the join; raw join shuffles both sides") {
    // AQE wraps the tree in AdaptiveSparkPlanExec before execution; the
    // co-location property is STATIC (bucketed scan output partitioning
    // satisfies the join requirement at planning time), so assert it on
    // the non-adaptive plan
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = Bucketing.bucketedJoin(spark, dir)
      val j = joinNode(q)
      assert(shufflesUnder(j.left) == 0 && shufflesUnder(j.right) == 0,
        s"bucketed sides must not shuffle:\n${q.queryExecution.executedPlan}")

      // the control: same join over the raw parquet scans DOES exchange
      val li = graft.Tables(spark, dir, "lineitem")
      val o = graft.Tables(spark, dir, "orders")
      val raw = li.hint("merge").join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n_items"))
      val jr = joinNode(raw)
      assert(shufflesUnder(jr.left) == 1 && shufflesUnder(jr.right) == 1,
        s"control join should shuffle both sides:\n${raw.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("bucketed path is value-identical to the raw join") {
    val bucketed = Bucketing.bucketedJoin(spark, dir).collect().toSeq
    val li = graft.Tables(spark, dir, "lineitem")
    val o = graft.Tables(spark, dir, "orders")
    val raw = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(bucketed == raw)
  }

  test("write-once: a second call reuses the session table, no rewrite") {
    val t = Bucketing.ensureBucketed(spark, dir, "orders", "o_orderkey")
    val files = spark.table(t).inputFiles.toSeq.sorted
    assert(Bucketing.ensureBucketed(spark, dir, "orders", "o_orderkey") == t)
    assert(spark.table(t).inputFiles.toSeq.sorted == files) // same files, not rewritten
  }
}
