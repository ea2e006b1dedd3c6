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

  test("dedup_eval: planted exact duplicates score recall 1.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedupeval").toString
    // three identical long docs (3 truth pairs) + one distinct doc;
    // identical texts have identical signatures, so LSH must surface
    // every truth pair → recall exactly 1.0
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    Seq((0L, "s", dup), (1L, "s", dup), (2L, "s", dup),
      (3L, "s", "completely different words populate this other document"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupQueries.dedupEval(spark, dir)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(got._3 == 3L, s"want 3 truth pairs, got $got")
    assert(got._2 == 3L, s"want all 3 truth pairs as hits, got $got")
    assert(got._5 == 1.0)
    assert(got._1 >= got._2 && got._4 > 0.0 && got._4 <= 1.0)
  }

  test("dedup_eval invariants on sf0.001") {
    import spark.implicits._
    val got = DedupQueries.dedupEval(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(got._2 <= got._1 && got._2 <= got._3)
    assert(got._4 >= 0.0 && got._4 <= 1.0 && got._5 >= 0.0 && got._5 <= 1.0)
    assert(got._1 > 0)
  }
}
