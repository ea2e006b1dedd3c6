package graft.ext

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[ClusterIndex]] must agree exactly with the oracle-gated
  * `dedup_clusters` fixpoint: the persisted build, the forCorpus memo
  * path, and batch-by-batch incremental appends must all yield the same
  * (doc_id, cluster_id) assignment as the one-shot recompute (exact
  * while LSH buckets stay under the ≤64 skew cap — true at this scale).
  * The synthetic-corpus test forces the hard incremental case: a batch
  * doc that BRIDGES two previously-separate clusters, so append must
  * relabel old rows it did not ingest.
  */
class ClusterIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assignments(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("persisted build == from-scratch dedupClusters") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val idxDir = Files.createTempDirectory("cidx-build").toString
    val n = ClusterIndex.build(docs, idxDir)
    assert(n > 0)
    assert(assignments(ClusterIndex.load(spark, idxDir)) ==
      assignments(DedupQueries.dedupClusters(spark, dir)))
  }

  test("forCorpus builds once per JVM and later reads hit the parquet") {
    val first = assignments(ClusterIndex.forCorpus(spark, dir))
    // second call must be a pure parquet read of the memoized location —
    // a parquet-scan leaf, no Generate/Aggregate from the sig pipeline
    val again = ClusterIndex.forCorpus(spark, dir)
    val plan = again.queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"expected a bare index read, got:\n$plan")
    assert(assignments(again) == first)
    assert(first == assignments(DedupQueries.dedupClusters(spark, dir)))
  }

  test("a crash between staging and commit leaves readers on the old state") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val idxDir = Files.createTempDirectory("cidx-crash").toString
    ClusterIndex.build(docs.filter(col("doc_id") < 100), idxDir)
    val before = assignments(ClusterIndex.load(spark, idxDir))
    // simulate an append that died after staging both parts but before
    // the manifest flip: garbage under the NEXT generation's names
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$idxDir/seg-2"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$idxDir/seg-2/part-0.parquet"),
      "not parquet".getBytes)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$idxDir/clusters-g2"))
    assert(assignments(ClusterIndex.load(spark, idxDir)) == before)
    // the RETRY of that append stages into the same next-gen names
    // (overwrite wipes the partial garbage) and commits cleanly: the
    // final state equals a fresh one-shot over the union
    ClusterIndex.append(docs.filter(col("doc_id") >= 100 && col("doc_id") < 200), idxDir)
    val oneShotDir = Files.createTempDirectory("cidx-crash-oneshot").toString
    ClusterIndex.build(docs.filter(col("doc_id") < 200), oneShotDir)
    assert(assignments(ClusterIndex.load(spark, idxDir)) ==
      assignments(ClusterIndex.load(spark, oneShotDir)))
  }

  test("append batch-by-batch == one-shot on real testdata (interleaved ids)") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val idxDir = Files.createTempDirectory("cidx-inc").toString
    ClusterIndex.build(docs.filter(col("doc_id") % 3 === 0), idxDir)
    ClusterIndex.append(docs.filter(col("doc_id") % 3 === 1), idxDir)
    ClusterIndex.append(docs.filter(col("doc_id") % 3 === 2), idxDir)
    assert(assignments(ClusterIndex.load(spark, idxDir)) ==
      assignments(DedupQueries.dedupClusters(spark, dir)))
  }

  test("compaction folds band segments into one without changing anything") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val idxDir = Files.createTempDirectory("cidx-compact").toString
    ClusterIndex.build(docs.filter(col("doc_id") % 3 === 0), idxDir)
    ClusterIndex.append(docs.filter(col("doc_id") % 3 === 1), idxDir)
    ClusterIndex.append(docs.filter(col("doc_id") % 3 === 2), idxDir)
    val before = assignments(ClusterIndex.load(spark, idxDir))
    ClusterIndex.compact(spark, idxDir)
    val st = graft.io.SegmentLog.read(idxDir).get
    assert(st.segments.size == 1)
    assert(assignments(ClusterIndex.load(spark, idxDir)) == before)
    // and a post-compaction append still behaves (reads the merged seg)
    // — idempotent no-new-docs check: appending an empty batch changes
    // nothing
    import spark.implicits._
    ClusterIndex.append(Seq.empty[(Long, String)].toDF("doc_id", "text"), idxDir)
    assert(assignments(ClusterIndex.load(spark, idxDir)) == before)
  }

  test("a bridging batch doc merges two old clusters (and untouched rows survive)") {
    import spark.implicits._
    // three near-dup families built from shared 3-gram runs: A (docs 1,2)
    // and B (10,11) are internally near but mutually far; C (20,21) is a
    // third, never-touched cluster; doc 30 shares shingles with BOTH A
    // and B — appending it must merge A∪B∪{30} under rep=1 while C keeps
    // rep=20 without re-entering the fixpoint. The texts were verified
    // against an offline replay of the exact md5+affine MinHash pipeline:
    // every intra-family pair AND bridge↔A/B share an LSH band, no
    // cross-family pair does (deterministic — the hashes are fixed).
    val a = "theta gamma kappa rho pi omicron zeta mu upsilon epsilon sigma beta"
    val b = "four nine seven three six thirteen eight fourteen one twelve ten five"
    val c = "dark indigo infra ultra yellow blue green violet"
    val corpus = Seq(
      1L -> s"$a extraone", 2L -> s"$a extratwo",
      10L -> s"$b extrathree", 11L -> s"$b extrafour",
      20L -> s"$c extrafive", 21L -> s"$c extrasix")
    val bridge = Seq(30L -> s"$a $b")
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

    val idxDir = Files.createTempDirectory("cidx-bridge").toString
    ClusterIndex.build(df(corpus), idxDir)
    val before = assignments(ClusterIndex.load(spark, idxDir)).toMap
    assert(before(1L) == before(2L) && before(10L) == before(11L))
    assert(before(1L) != before(10L))
    assert(before(20L) == 20L && before(21L) == 20L)

    ClusterIndex.append(df(bridge), idxDir)
    val after = assignments(ClusterIndex.load(spark, idxDir)).toMap
    assert(Seq(1L, 2L, 10L, 11L, 30L).map(after).distinct == Seq(1L),
      s"bridge must merge A and B under rep 1: $after")
    assert(after(20L) == 20L && after(21L) == 20L)

    // and the merged state equals a one-shot build over the full corpus
    val oneShotDir = Files.createTempDirectory("cidx-oneshot").toString
    ClusterIndex.build(df(corpus ++ bridge), oneShotDir)
    assert(assignments(ClusterIndex.load(spark, idxDir)) ==
      assignments(ClusterIndex.load(spark, oneShotDir)))
  }

  test("a batch that pushes a bucket past the cap retracts its earlier edges") {
    import spark.implicits._
    // the r12 sf1 divergence regime, distilled: 60 EXACT replicas (one
    // LSH bucket per band, all under the ≤64 cap) cluster at build;
    // appending 20 more pushes every one of their buckets to 80 — the
    // one-shot form drops over-cap buckets whole, so the replica family
    // must DISSOLVE on append (edges retracted), while an untouched
    // 2-doc cluster survives byte-identically
    val fam = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val small = "red orange yellow green blue purple brown black"
    val oldDocs = (1L to 60L).map(_ -> fam) ++ Seq(100L -> small, 101L -> small)
    val batch = (61L to 80L).map(_ -> fam)
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

    val idxDir = Files.createTempDirectory("cidx-overflow").toString
    ClusterIndex.build(df(oldDocs), idxDir)
    val before = assignments(ClusterIndex.load(spark, idxDir)).toMap
    assert((1L to 60L).map(before).distinct == Seq(1L),
      s"replica family must cluster under the cap: $before")
    assert(before(100L) == 100L && before(101L) == 100L)

    ClusterIndex.append(df(batch), idxDir)
    val after = assignments(ClusterIndex.load(spark, idxDir))
    val oneShotDir = Files.createTempDirectory("cidx-overflow-oneshot").toString
    ClusterIndex.build(df(oldDocs ++ batch), oneShotDir)
    assert(after == assignments(ClusterIndex.load(spark, oneShotDir)),
      "append must equal one-shot in the over-cap regime")
    val m = after.toMap
    assert(!m.contains(1L), "retracted family must dissolve")
    assert(m.get(100L).contains(100L) && m.get(101L).contains(100L))
  }
}
