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

  test("z-order layout: 2-D box filter skips most row groups") {
    // Z-VALUE: interleave the low 16 bits of user_id and epoch-day, then
    // range-partition + sort by it — rows close in BOTH dimensions land
    // in the same files, so parquet min/max stats prune a 2-D box filter
    // that neither single-column sort could serve. This is the plain-
    // parquet form of what Delta/Iceberg call Z-ORDER clustering; at
    // 100 TB it is how a scan over (user, time) boxes avoids reading the
    // whole table.
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", datediff(to_date(col("ts")), lit("2024-01-01")))
      .select("event_id", "user_id", "day", "value")
    val z = ev.withColumn("zval", expr(
      """aggregate(sequence(0, 15), 0L, (acc, i) ->
           acc | shiftleft(shiftright(user_id, i) & 1, 2 * i)
               | shiftleft(shiftright(cast(day AS bigint), i) & 1, 2 * i + 1))"""))

    val zDir = Files.createTempDirectory("zorder").toString
    val rDir = Files.createTempDirectory("random").toString
    z.repartitionByRange(16, col("zval")).sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(zDir)
    // control: same rows, layout uncorrelated with the filter dims
    z.repartition(16, col("event_id")).sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet(rDir)

    def scanRows(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter(col("user_id").between(10, 40) && col("day").between(5, 12))
      // execute THIS plan (count() would build its own QueryExecution,
      // leaving these scan metrics untouched), then unwrap AQE to reach
      // the final executed scan nodes
      val n = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scanned = plan.collectLeaves()
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value }.sum
      (n, scanned)
    }
    val (nZ, scannedZ) = scanRows(zDir)
    val (nR, scannedR) = scanRows(rDir)
    assert(nZ == nR && nZ > 0) // same answer either way
    info(s"rows=$nZ scanned: zorder=$scannedZ random=$scannedR")
    // the random layout's row groups all span the full (user, day) space
    // so stats prune nothing; the z-ordered layout reads a fraction
    assert(scannedR > 0 && scannedZ * 2 < scannedR,
      s"z-order did not skip: $scannedZ vs $scannedR")
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
