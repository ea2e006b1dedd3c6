package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Two-phase distributed global ordering primitives — exact global
  * rank and exact running (prefix) sum with NO single-task sort.
  *
  * The pattern both share: (1) range-partition by the order keys
  * (contiguous ordered key ranges; the range sampler balances sizes so
  * no task holds more than ~n/P rows), stamp each row with its
  * partition id, and compute the local statistic WITHIN each
  * partition; (2) the cross-partition correction is a prefix sum over
  * ONE row per partition — P rows, bounded by the shuffle-partition
  * count whatever the corpus size — broadcast back. Range partition i
  * precedes i+1 in key order, so offset(pid) + local IS the global
  * statistic, exactly, for any sampled bounds; with fully tie-broken
  * keys the result is deterministic. The stamped intermediate is
  * persisted because both phases consume it — unpersisted, the range
  * exchange would plan (and run) twice.
  *
  * This replaces the `Window.orderBy(...)` single-task idiom wherever
  * the ordered frame grows with the corpus (vocabulary ranks, part
  * revenue ranks, customer quantiles): the corpus-proportional sort
  * that is fine at sf0.01 and a straggler-killer at 100 TB.
  */
object DistRank {

  /** Exact 0-based global rank by `keys` (dense total order; ties must
    * be fully broken by the key list for determinism).
    */
  def globalRank(df: DataFrame, rankCol: String,
      keys: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val local = df.repartitionByRange(parts, keys: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lr", row_number().over(
        Window.partitionBy("_pid").orderBy(keys: _*)).cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val offsets = local.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .withColumn("_off", coalesce(sum("_cnt").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_pid", "_off")
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn(rankCol, col("_off") + col("_lr") - 1)
      .drop("_pid", "_lr", "_off")
  }

  /** Exact EXCLUSIVE prefix minimum of `valueCol` in `keys` order —
    * for each row, the minimum over all STRICTLY preceding rows (null
    * for the global first row). The sweep primitive behind skyline /
    * staircase queries: "is any point ordered before me already at or
    * below my value?" answered with no single-task sort. Same
    * two-phase shape as [[globalCumSum]]: partition-local exclusive
    * cummin, then a P-row exclusive prefix-min of per-partition
    * minima broadcast back (`least` skips nulls, so partition-first
    * rows pick up exactly the cross-partition offset).
    */
  def globalCumMinExcl(df: DataFrame, valueCol: String, cumCol: String,
      keys: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val local = df.repartitionByRange(parts, keys: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lm", min(col(valueCol)).over(
        Window.partitionBy("_pid").orderBy(keys: _*)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pmin = local.groupBy("_pid").agg(min(col(valueCol)).as("_pmin"))
    val offsets = pmin
      .withColumn("_off", min("_pmin").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)))
      .select("_pid", "_off")
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn(cumCol, least(col("_lm"), col("_off")))
      .drop("_pid", "_lm", "_off")
  }

  /** Exact inclusive prefix sum of `valueCol` in `keys` order, plus
    * the grand total — both as new columns (`cumCol`, `totCol`). The
    * sum type follows Spark's sum-of-`valueCol` typing (decimal sums
    * stay exact and order-free, which is what makes the partition-
    * local phase safe). The grand total rides the same P-row offsets
    * frame — no second scan of `df`.
    */
  def globalCumSum(df: DataFrame, valueCol: String, cumCol: String,
      totCol: String, keys: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val local = df.repartitionByRange(parts, keys: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lc", sum(col(valueCol)).over(
        Window.partitionBy("_pid").orderBy(keys: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ptot = local.groupBy("_pid").agg(sum(col(valueCol)).as("_psum"))
    val offsets = ptot
      .withColumn("_off", sum("_psum").over(
        Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_tot", sum("_psum").over(
        Window.orderBy("_pid").rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select("_pid", "_off", "_tot")
    local.join(broadcast(offsets), Seq("_pid"))
      .withColumn(cumCol, col("_lc") + coalesce(col("_off"), lit(0)))
      .withColumn(totCol, col("_tot"))
      .drop("_pid", "_lc", "_off", "_tot")
  }
}
