package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4 / SCALE.md). AQE's runtime
  * skew-join splitting is the first line of defense; explicit salting is
  * the deterministic fallback when one join key dominates so heavily
  * that even split partitions bottleneck (celebrity keys), or when AQE
  * is unavailable (streaming micro-batches, non-AQE engines).
  */
object Skew {

  /** Salted equi-join: the (large, skewed) probe side scatters each row
    * into one of `salt` sub-keys — deterministic hash of `probeUnique`,
    * NOT rand(), so retries and oracle comparisons reproduce — while the
    * (small) build side replicates `salt`-fold. The hot key's rows land
    * on `salt` reducers instead of one; results are identical to the
    * plain join (spec-verified).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int, probeUnique: String): DataFrame = {
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(col(probeUnique)), lit(salt.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for low-cardinality group keys (the groupBy
    * analog of salting): partial-aggregate on (key, salt), then final on
    * key. Spark's map-side partial agg already does this for algebraic
    * functions; the explicit form targets aggregates that BUFFER per
    * group (collect_list-style). Be precise about what it buys: the
    * partial BUILD (CPU, spill, buffer growth) spreads over `salt`
    * reducers, but the final merge still assembles one buffer per key —
    * if the output IS the full collection, that buffer is the output and
    * is irreducible. When the consumer only needs a bounded digest, the
    * right tool is a bounded aggregate instead (e.g.
    * [[graft.functions.TopKByScore]], whose partial/final split caps
    * every buffer at k) — salting and bounded aggregates compose but
    * solve different halves of the problem.
    */
  def saltedAgg(df: DataFrame, key: String, salt: Int, uniqueCol: String,
      partial: Column, merge: Column => Column): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(salt.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(partial.as("__partial"))
      .groupBy(col(key))
      .agg(merge(col("__partial")).as("agg"))
}
