package graft

import org.apache.spark.sql.DataFrame

/** Block-storage helpers for iterative (fixpoint) operators. */
object SparkUtil {

  /** Key/label sets at or below this EXACT row count get an explicit
    * `broadcast()` hint in fixpoint joins (closure BFS, CC label rounds):
    * the driver already counts them per iteration, so hinted joins plan
    * straight to broadcast-hash with no shuffle-and-measure step, while
    * bigger sets still shuffle. ONE shared knob: a driver-memory retune
    * must not have to chase per-operator copies.
    *
    * NARROW-KEY ASSUMPTION (load-bearing): the limit is a ROW count and
    * the hint bypasses `autoBroadcastJoinThreshold`'s byte check, so it
    * is calibrated for the key sets these fixpoint joins actually carry —
    * single numeric pks / (id, label) longs, ~16–24 bytes a row, ≈
    * tens of MB at the limit. Feeding this knob wide keys (multi-column
    * or string pks, hundreds of bytes a row) would build broadcast
    * relations of hundreds of MB; if such a catalog appears, scale the
    * effective limit by estimated key width (rows × avg pk bytes ≤ the
    * same ~100 MB budget) instead of raising this constant.
    */
  val BroadcastRowLimit = 4000000L

  /** Release a DataFrame's storage, including locally-checkpointed
    * blocks: `Dataset.unpersist` only clears CacheManager entries, while a
    * `localCheckpoint` stores its blocks on the UNDERLYING RDD (reachable
    * through the `LogicalRDD` leaf), which would otherwise linger until
    * ContextCleaner GC.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(false)
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }
  }
}
