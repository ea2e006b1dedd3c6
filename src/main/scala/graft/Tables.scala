package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver testdata (`/root/repo/TESTDATA.md`).
  * One read per call keeps each registered query self-contained; Catalyst
  * prunes columns and pushes filters into the parquet scan.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for. Read it as raw long nanos and truncate to a microsecond
    * timestamp — the same floor-division DuckDB applies when reading
    * TIMESTAMP_NS, so oracle comparisons see identical instants.
    *
    * The `nanosAsLong` conf is set at session BUILD by every graft main
    * and the test harness; the set below is only a fallback for foreign
    * sessions (it is a session-wide legacy flag, not a per-read option —
    * mutating shared-session conf mid-read is otherwise a hazard).
    */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
}
