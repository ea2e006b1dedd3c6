package graft

import org.apache.spark.sql.DataFrame

/** Block-storage helpers for iterative (fixpoint) operators. */
object SparkUtil {

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
