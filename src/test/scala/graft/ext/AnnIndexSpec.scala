package graft.ext

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[AnnIndex]] must (1) return exactly what the oracle-gated in-memory
  * `ann_ivf` query returns for the same centroids/probes/k, and (2)
  * actually prune: the probe scan may only touch the probed cells'
  * files — the partition-pruning payoff the partitioned layout exists
  * for.
  */
class AnnIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partitioned index search == in-memory ann_ivf; scan prunes to probed cells") {
    val base = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val cents: Seq[(Long, Seq[Double])] = base.filter(col("vec_id") < 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq

    val idxDir = Files.createTempDirectory("ann-idx").toString
    val n = AnnIndex.build(base, cents, idxDir)
    assert(n == base.count())

    val probes = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val got = AnnIndex.search(spark, idxDir, cents, probes, nprobe = 2, k = 5)
    val want = SimilarityQueries.annIvf(spark, dir)
    assert(got.collect().map(_.toSeq).toSeq ==
      want.collect().map(_.toSeq).toSeq)

    // generalized nprobe: widening the probe list can only improve the
    // best hit (monotone recall) — pins the comparator-sort probe path
    // beyond the (best, second) pair the in-memory query carries
    val top1 = (d: org.apache.spark.sql.DataFrame) => d
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val c2 = top1(got)
    val c3 = top1(AnnIndex.search(spark, idxDir, cents, probes, nprobe = 3, k = 5))
    assert(c3.keySet == c2.keySet && c2.forall { case (q, c) => c3(q) >= c })

    // pruning proof: execute the search plan and read the scan's file
    // count — it must cover only the probed cells' partitions, not all 16
    val df = AnnIndex.search(spark, idxDir, cents, probes, nprobe = 2, k = 5)
    df.collect()
    // recurse through AQE wrappers: materialized stages appear as
    // QueryStageExec LEAVES whose real subtree hangs off .plan
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
      .filter(_.metrics.contains("numFiles"))
    assert(scans.nonEmpty)
    val idxScan = scans.filter(_.metadata.get("Location")
      .exists(_.contains("ann-idx"))).head
    val filesRead = idxScan.metrics("numFiles").value
    val allFiles = Files.walk(java.nio.file.Paths.get(s"$idxDir/ann_index"))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(filesRead > 0 && filesRead < allFiles,
      s"no pruning: read $filesRead of $allFiles files")
    assert(idxScan.metadata.get("PartitionFilters").exists(_.contains("cell")))
  }

  test("incremental append == one-shot rebuild (same centroids)") {
    val base = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val cents: Seq[(Long, Seq[Double])] = base.filter(col("vec_id") < 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val mid = base.agg(expr("percentile(vec_id, 0.5)")).head().getDouble(0)

    val incDir = Files.createTempDirectory("ann-idx-inc").toString
    AnnIndex.build(base.filter(col("vec_id") <= mid), cents, incDir)
    AnnIndex.append(base.filter(col("vec_id") > mid), cents, incDir)
    val oneDir = Files.createTempDirectory("ann-idx-one").toString
    AnnIndex.build(base, cents, oneDir)

    val probes = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val inc = AnnIndex.search(spark, incDir, cents, probes, nprobe = 2, k = 5)
      .collect().map(_.toSeq).toSeq
    val one = AnnIndex.search(spark, oneDir, cents, probes, nprobe = 2, k = 5)
      .collect().map(_.toSeq).toSeq
    assert(inc == one && inc.nonEmpty)

    // compaction merges the two segments back to one, results unchanged
    AnnIndex.compact(spark, incDir)
    assert(graft.io.SegmentLog.read(s"$incDir/ann_index").get.segments.size == 1)
    val post = AnnIndex.search(spark, incDir, cents, probes, nprobe = 2, k = 5)
      .collect().map(_.toSeq).toSeq
    assert(post == one)
  }
}
