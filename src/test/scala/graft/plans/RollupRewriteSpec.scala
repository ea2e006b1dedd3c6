package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.SparkSpec
import graft.ext.RollupIndex
import graft.io.SegmentLog

/** Pins [[RollupRewriteRule]]'s materialized-view auto-rewrite:
  * rewrite == original (bit-for-bit over exact count/sum), the
  * rewritten plan reads ONLY index segments (the events relation is
  * gone), and the guards — unregistered path, non-matching shapes,
  * DISTINCT/FILTER aggregates — leave plans untouched.
  */
class RollupRewriteSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def withRule[A](f: => A): A = {
    if (!spark.experimental.extraOptimizations.contains(RollupRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewriteRule
    try f
    finally RollupRewrite.clear()
  }

  private def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten

  private def events = graft.Tables(spark, sfDir, "events")

  private def rollupQuery = events
    .groupBy(col("event_type"), to_date(col("ts")).as("day"))
    .agg(count(lit(1)).as("n"),
      sum(col("value").cast("decimal(18,4)")).as("sum_value"))

  test("matching aggregate is rewritten to the index and stays exact") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-mvspec-").toString
    try {
      RollupIndex.build(events.filter(col("event_id") % 2 === 0), idxDir)
      RollupIndex.append(events.filter(col("event_id") % 2 === 1), idxDir)
      val expected = rollupQuery.orderBy("event_type", "day").collect()
      withRule {
        RollupRewrite.register(s"$sfDir/events.parquet", idxDir)
        val q = rollupQuery
        val paths = scannedPaths(q)
        assert(!paths.exists(_.contains("events.parquet")),
          s"events still scanned: $paths\n${q.queryExecution.optimizedPlan}")
        assert(paths.exists(_.contains("rollup_index")), paths.toString)
        val got = q.orderBy("event_type", "day").collect()
        assert(got.toSeq == expected.toSeq)
        // schema must be indistinguishable from the original's
        assert(q.schema == rollupQuery.schema ||
          q.schema.map(f => (f.name, f.dataType)) ==
            rollupQuery.schema.map(f => (f.name, f.dataType)))
      }
    } finally SegmentLog.deleteRecursively(idxDir)
  }

  test("parent operators over the rewritten aggregate resolve unchanged") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-mvspec-").toString
    try {
      RollupIndex.build(events, idxDir)
      val base = rollupQuery.filter(col("n") > 2)
        .select(col("event_type"), col("day"), col("sum_value"))
        .orderBy(desc("sum_value"), asc("event_type"), asc("day")).limit(5)
      val expected = base.collect()
      withRule {
        RollupRewrite.register(s"$sfDir/events.parquet", idxDir)
        val q = rollupQuery.filter(col("n") > 2)
          .select(col("event_type"), col("day"), col("sum_value"))
          .orderBy(desc("sum_value"), asc("event_type"), asc("day")).limit(5)
        assert(!scannedPaths(q).exists(_.contains("events.parquet")))
        assert(q.collect().toSeq == expected.toSeq)
      }
    } finally SegmentLog.deleteRecursively(idxDir)
  }

  test("unregistered path, shape mismatches, and distinct/filter aggs do not fire") {
    val idxDir = java.nio.file.Files.createTempDirectory("graft-mvspec-").toString
    try {
      RollupIndex.build(events, idxDir)
      withRule {
        // not registered → untouched
        assert(scannedPaths(rollupQuery).exists(_.contains("events.parquet")))
        RollupRewrite.register(s"$sfDir/events.parquet", idxDir)
        // extra grouping column → untouched
        val g3 = events.groupBy(col("event_type"), to_date(col("ts")),
          col("user_id")).agg(count(lit(1)))
        assert(scannedPaths(g3).exists(_.contains("events.parquet")))
        // aggregate outside the rollup surface (avg) → untouched
        val avgQ = events.groupBy(col("event_type"), to_date(col("ts")))
          .agg(avg(col("value")))
        assert(scannedPaths(avgQ).exists(_.contains("events.parquet")))
        // DISTINCT count → untouched
        val dQ = events.groupBy(col("event_type"), to_date(col("ts")))
          .agg(countDistinct(col("user_id")))
        assert(scannedPaths(dQ).exists(_.contains("events.parquet")))
        // the index-building aggregate itself (hll sketch col) → untouched
        val hllQ = events.groupBy(col("event_type"), to_date(col("ts")))
          .agg(count(lit(1)), expr("hll_sketch_agg(user_id, 14)"))
        assert(scannedPaths(hllQ).exists(_.contains("events.parquet")))
        // different source table of the same shape → untouched
        val oQ = graft.Tables(spark, sfDir, "orders")
          .groupBy(col("o_orderstatus")).agg(count(lit(1)))
        assert(scannedPaths(oQ).exists(_.contains("orders.parquet")))
      }
    } finally SegmentLog.deleteRecursively(idxDir)
  }
}
