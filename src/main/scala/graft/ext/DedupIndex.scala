package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted form of [[DedupQueries.dedupIncremental]]'s "old side":
  * a parquet index of (doc_id, fp, sig) that recurring ingest dedupes
  * each new batch against WITHOUT rescanning the corpus — the dedup
  * analogue of the closure's previous-artifact `preSeen` keys made
  * concrete. Lifecycle:
  *
  * {{{
  * DedupIndex.build(corpusDocs, dir)          // once
  * val kept = DedupIndex.dedupe(batch, dir)   // per batch: survivors
  * DedupIndex.append(batch, dir)              // fold the WHOLE batch in
  * }}}
  *
  * `append` takes the whole batch, not just survivors: the drop rule is
  * near-ANY-earlier (kept or not — a dropped doc still blocks a later
  * doc that is near it but not near its keeper), so the index must
  * remember everything seen or batch-by-batch ingest would drift from
  * the one-shot result. Same contract as the batch rule in
  * [[DedupQueries.semDedup]] and the paper it follows.
  *
  * `dedupe` runs [[DedupQueries.dedupIncrementalCore]] — the SAME
  * algorithm as the oracle-gated `dedup_incremental` query, with the
  * index standing in for the old rows — so the two paths cannot drift
  * (DedupIndexSpec proves byte-equality of the survivor sets, and that
  * batch-by-batch ingest equals the one-shot split).
  *
  * 100 TB posture: the recurring cost is one fp shuffle and one
  * (band, bucket) shuffle of BATCH + INDEX KEYS — never a corpus
  * rescan. The index carries ~50 bytes/doc (hex fp + 8 longs); at
  * 10B docs that is ~500 GB of parquet, scanned column-pruned per
  * batch. Production layouts bucket it by `fp` (exact rule co-located)
  * and keep a second copy bucketed by band bucket; appends are plain
  * parquet appends, compacted by the artifact maintenance the JSON
  * sink already has. Index doc_ids MUST precede batch doc_ids (ingest
  * order) for the greedy first-wins rule to be well-defined.
  */
object DedupIndex {

  private def path(dir: String) = s"$dir/dedup_index"

  /** Build the index from scratch over raw documents (doc_id, text). */
  def build(docs: DataFrame, dir: String): Long = {
    val d = DedupQueries.fpSig(docs)
    d.write.mode("overwrite").parquet(path(dir))
    d.count()
  }

  /** Fold an ingested batch (ALL of it — see the class note) into the
    * index.
    */
  def append(docs: DataFrame, dir: String): Long = {
    val d = DedupQueries.fpSig(docs)
    d.write.mode("append").parquet(path(dir))
    d.count()
  }

  /** Surviving doc_ids of `batch` after dedup against the index AND
    * earlier batch docs (greedy first-wins by doc_id).
    */
  def dedupe(spark: SparkSession, batch: DataFrame, dir: String): DataFrame = {
    val idx = spark.read.parquet(path(dir))
      .withColumn("is_old", lit(true))
    val b = DedupQueries.fpSig(batch)
      .withColumn("is_old", lit(false))
    DedupQueries.dedupIncrementalCore(
        idx.unionByName(b).select("doc_id", "is_old", "fp", "sig"))
      .orderBy("doc_id")
  }
}
