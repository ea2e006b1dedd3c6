package graft.ext

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[DedupIndex]] must agree exactly with the oracle-gated
  * `dedup_incremental` query (same split, same survivors), and
  * batch-by-batch ingest through the index must equal the one-shot
  * result — the property that makes a recurring pipeline trustworthy.
  * (Both equalities are exact while LSH buckets stay under the core's
  * ≤64 skew cap — true at this scale; past the cap the near rule is an
  * approximation in BOTH paths, see the DedupIndex precision caveat.)
  */
class DedupIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("index-based dedupe equals the one-scan oracle-gated query") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val idxDir = Files.createTempDirectory("dedup-idx").toString
    val nOld = DedupIndex.build(docs.filter(col("doc_id") % 5 < 3), idxDir)
    assert(nOld > 0)
    val survivors = DedupIndex
      .dedupe(spark, docs.filter(col("doc_id") % 5 >= 3), idxDir)
      .collect().map(_.getLong(0)).toSeq
    val oracle = DedupQueries.dedupIncremental(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(survivors == oracle)
  }

  test("batch-by-batch ingest equals the one-shot split") {
    // ingest the "new" docs as two id-ordered batches; greedy first-wins
    // by doc_id makes sequential == one-shot exactly when batches respect
    // id order (the documented ingest-order contract)
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val newDocs = docs.filter(col("doc_id") % 5 >= 3)
    val mid = newDocs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
    val (b1, b2) = (newDocs.filter(col("doc_id") <= mid),
      newDocs.filter(col("doc_id") > mid))

    val idxDir = Files.createTempDirectory("dedup-idx2").toString
    DedupIndex.build(docs.filter(col("doc_id") % 5 < 3), idxDir)
    val s1 = DedupIndex.dedupe(spark, b1, idxDir)
      .collect().map(_.getLong(0)).toSeq
    // the WHOLE batch goes in (dropped docs still block later ones)
    DedupIndex.append(b1, idxDir)
    val s2 = DedupIndex.dedupe(spark, b2, idxDir)
      .collect().map(_.getLong(0)).toSeq

    val oneShot = DedupQueries.dedupIncremental(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert((s1 ++ s2) == oneShot)

    // compaction folds the three segments into one; dedupe against the
    // compacted index and the bloom extra both behave identically
    DedupIndex.append(b2, idxDir)
    DedupIndex.writeBloom(spark, idxDir)
    val rowsBefore = DedupIndex.rows(spark, idxDir)
      .collect().map(_.toSeq).toSet
    DedupIndex.compact(spark, idxDir)
    val st = graft.io.SegmentLog.read(s"$idxDir/dedup_index").get
    assert(st.segments.size == 1 && st.extras.contains("bloom"))
    assert(DedupIndex.rows(spark, idxDir).collect().map(_.toSeq).toSet == rowsBefore)
    // the bloom pointer still resolves and keeps its no-false-negative
    // contract over the (unchanged) fingerprint set
    val bf = DedupIndex.loadBloom(spark, idxDir)
    val fps = DedupIndex.rows(spark, idxDir).select("fp")
      .collect().map(_.getString(0))
    assert(fps.nonEmpty && fps.forall(bf.mightContain))
  }
}
