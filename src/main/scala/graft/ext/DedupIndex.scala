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
  * index standing in for the old rows (DedupIndexSpec proves
  * survivor-set equality, and that batch-by-batch ingest equals the
  * one-shot split). PRECISION CAVEAT: the core's ≤64 LSH bucket cap (the
  * minhashPairs skew guard) skips the near rule for oversized buckets,
  * and bucket population differs between a growing index and the
  * one-shot frame — so the batch-by-batch == one-shot equality is exact
  * while buckets stay under the cap (true at spec scale) and an
  * approximation past it, like every capped LSH dedup.
  *
  * 100 TB posture: the recurring cost is the batch fpSig pipeline ONCE
  * (narrow localCheckpoint, as in the registered query) plus one fp
  * shuffle and one (band, bucket) shuffle — the exact and near rules
  * each read the index through one column-pruned scan, and the
  * corpus text is never rescanned. The index carries ~50 bytes/doc
  * (hex fp + 8 longs): ~500 GB of parquet at 10B docs. Production
  * layouts bucket it by `fp` and keep a second copy bucketed by band
  * bucket. `build`'s SaveMode.Overwrite is NOT an atomic commit: the
  * index is a DERIVED artifact (rebuildable from the corpus), and a
  * deployment that needs crash-safe maintenance would commit new
  * generations via the same manifest-pointer protocol
  * [[graft.io.JsonTableIO]] uses for data artifacts. Index doc_ids MUST
  * precede batch doc_ids (ingest order) for the greedy first-wins rule
  * to be well-defined.
  */
object DedupIndex {

  private def path(dir: String) = s"$dir/dedup_index"

  /** Build the index from scratch over raw documents (doc_id, text).
    * Returns the indexed row count — read from the written parquet
    * footers (metadata-only), never by recomputing the fpSig pipeline.
    */
  def build(docs: DataFrame, dir: String): Long = {
    DedupQueries.fpSig(docs).write.mode("overwrite").parquet(path(dir))
    docs.sparkSession.read.parquet(path(dir)).count()
  }

  /** Fold an ingested batch (ALL of it — see the class note) into the
    * index. Returns the batch's indexed row count.
    */
  def append(docs: DataFrame, dir: String): Long = {
    val before = docs.sparkSession.read.parquet(path(dir)).count()
    DedupQueries.fpSig(docs).write.mode("append").parquet(path(dir))
    docs.sparkSession.read.parquet(path(dir)).count() - before
  }

  private def bloomPath(dir: String) = s"$dir/dedup_index.bloom"

  /** Derive (or re-derive) the index's Bloom sketch artifact from the
    * persisted fingerprints — ONE column-pruned fp scan of the index,
    * distributed tree-aggregation build, sketch bytes written through
    * the Hadoop FileSystem API (object-store portable). Rebuilt rather
    * than merged on append: two Bloom filters only merge when sized
    * identically, and re-sizing to the grown corpus keeps the fp rate
    * at the configured 1% instead of degrading as the index grows.
    * Returns the indexed fingerprint count the sketch was sized for.
    */
  def writeBloom(spark: SparkSession, dir: String): Long = {
    val fps = spark.read.parquet(path(dir)).select("fp")
    val n = fps.count()
    val bf = fps.stat.bloomFilter("fp", math.max(n, 1L), 0.01)
    val p = new org.apache.hadoop.fs.Path(bloomPath(dir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try bf.writeTo(out) finally out.close()
    n
  }

  /** Load the sketch artifact (driver-side: the serialized bits are the
    * broadcast payload, ~1.2 MB per million fingerprints at 1% fp).
    */
  def loadBloom(spark: SparkSession, dir: String): org.apache.spark.util.sketch.BloomFilter = {
    val p = new org.apache.hadoop.fs.Path(bloomPath(dir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try org.apache.spark.util.sketch.BloomFilter.readFrom(in) finally in.close()
  }

  /** EXACT-rule pre-gate: flag each batch doc whose content fingerprint
    * the index has probably seen, as a pure projection through the
    * broadcast sketch — no index scan, no shuffle. No false negatives,
    * so `likely_seen = false` rows are definitively exact-fresh and can
    * skip the fp join in [[dedupe]]; flagged rows still take the exact
    * path (1% are false positives), and the NEAR rule's banded pipeline
    * is untouched either way. This is the [[DedupQueries.dedupBloom]]
    * shape wired to the persisted lifecycle.
    */
  def prefilter(spark: SparkSession, batch: DataFrame, dir: String): DataFrame = {
    val bf = loadBloom(spark, dir)
    batch
      .withColumn("fp", DedupQueries.contentFp(col("text")))
      .withColumn("likely_seen",
        graft.functions.BloomMightContain.might_contain(spark, bf, col("fp")))
      .select("doc_id", "fp", "likely_seen")
  }

  /** Surviving doc_ids of `batch` after dedup against the index AND
    * earlier batch docs (greedy first-wins by doc_id).
    */
  def dedupe(spark: SparkSession, batch: DataFrame, dir: String): DataFrame = {
    val idx = spark.read.parquet(path(dir))
      .withColumn("is_old", lit(true))
    // the batch's md5-per-shingle pipeline runs ONCE into a narrow
    // checkpoint — the core's three consumers would otherwise re-run it
    // (the duplicate-subtree trap dedupIncremental documents); the index
    // side stays a plain parquet scan, column-pruned per consumer
    val b = DedupQueries.fpSig(batch)
      .withColumn("is_old", lit(false))
      .select("doc_id", "is_old", "fp", "sig")
      .localCheckpoint(false)
    DedupQueries.dedupIncrementalCore(
        idx.select("doc_id", "is_old", "fp", "sig").unionByName(b))
      .orderBy("doc_id")
  }
}
