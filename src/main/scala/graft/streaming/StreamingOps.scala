package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming forms of the event-time operators (SURVEY.md
  * §2.11). The reference is strictly batch; the driver testdata designates
  * `events` as the stream table, and these transforms are the
  * `readStream` duals of [[graft.ext.EventQueries]] — identical
  * expressions, so the batch oracle checks the semantics and
  * StreamingSpec checks the streaming execution (watermarks, append mode,
  * state cleanup).
  *
  * Scale: watermark + windowed aggregation is Spark's standard streaming
  * state layout — state keyed by (window, group key), dropped once the
  * watermark passes the window end. Sessionization uses session_window's
  * merging state. `dedupeWithinWatermark` bounds the dedup state to the
  * watermark horizon.
  */
object StreamingOps {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events directory (parquet). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(path)

  /** Tumbling 1-day counts per event type, 10-minute watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Session windows per user (30-minute gap), 10-minute watermark. */
  def sessionize(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** Exactly-once-ish dedup by event_id within the watermark horizon. */
  def dedupeWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  final case class UserActivity(user_id: Long, n_events: Long,
      total_value: Double, last_ts: java.sql.Timestamp)

  /** Custom keyed state via mapGroupsWithState (SURVEY.md §2.11): a
    * running per-user activity profile that survives across micro-batches
    * — the KeyValueGroupedDataset state tier for semantics windows can't
    * express. State per key is O(1); at 100 TB keys shard across the
    * cluster's state stores.
    */
  def userActivity(events: DataFrame): org.apache.spark.sql.Dataset[UserActivity] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "ts", "value")
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[UserActivity]) =>
          val prev = state.getOption.getOrElse(UserActivity(user, 0L, 0.0, null))
          val batch = rows.toSeq
          val next = UserActivity(
            user,
            prev.n_events + batch.size,
            prev.total_value + batch.map(_._3).sum,
            batch.map(_._2).maxByOption(_.getTime)
              .orElse(Option(prev.last_ts)).orNull)
          state.update(next)
          next
      }
  }
}
