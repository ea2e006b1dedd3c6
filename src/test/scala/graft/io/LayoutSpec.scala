package graft.io

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Storage-layout behaviors the 100 TB design leans on: partitioned
  * writes with partition pruning at read, and bucketed tables that join
  * without a shuffle (SURVEY.md §4 "partition pruning", §2.1 sinks).
  */
class LayoutSpec extends SparkSpec {

  test("partitionBy write + partition-pruned read") {
    val dir = Files.createTempDirectory("partwrite").toString
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val clicks = spark.read.parquet(dir).filter(col("event_type") === "click")
    // pruning is visible in the physical plan's PartitionFilters
    val plan = clicks.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    assert(clicks.count() ==
      ev.filter(col("event_type") === "click").count())
  }

  test("bucketed tables join without an exchange") {
    // force a sort-merge plan: with broadcast active the planner ignores
    // bucketing entirely (it is the >10MB-side story we're testing)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinBody(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // a stale warehouse dir from a killed run blocks CREATE TABLE even
    // after DROP (the in-memory catalog never knew the table)
    val wh = new java.io.File(new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath)
    Seq("b_orders", "b_lineitem").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        import scala.reflect.io.Directory
        new Directory(d).deleteRecursively()
      }
    }
    val ord = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-bucketed co-sorted join: no ShuffleExchange on either side
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(joined.count() == li.join(ord,
      col("l_orderkey") === col("o_orderkey")).count())
  }
}
