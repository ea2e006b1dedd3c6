package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected-components invariants for [[DedupQueries.dedupClusters]] on
  * the sf0.001 testdata (the oracle already hash-pins the exact output at
  * sf0.01; these pin the SEMANTICS a hash can't explain).
  */
class DedupClustersSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("labels are component minima and edges never cross clusters") {
    val clusters = DedupQueries.dedupClusters(spark, dir)
      .persist()
    val pairs = DedupQueries.minhashPairs(spark, dir)
      .select("doc_a", "doc_b")

    // every edge endpoint carries the SAME cluster id (connectivity is
    // fully propagated — the fixpoint really converged)
    val crossing = pairs
      .join(clusters.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), Seq("doc_a"))
      .join(clusters.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), Seq("doc_b"))
      .filter(col("ca") =!= col("cb"))
    assert(crossing.count() == 0L)

    // a cluster id is the MIN doc_id of its own members (min-label CC),
    // and is itself a member
    val byCluster = clusters.groupBy("cluster_id")
      .agg(min("doc_id").as("min_member"))
    assert(byCluster.filter(col("cluster_id") =!= col("min_member")).count() == 0L)

    // exactly the docs that appear in >= 1 candidate pair are labelled
    val inPairs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    assert(clusters.count() == inPairs.count())
    clusters.unpersist()
  }
}
