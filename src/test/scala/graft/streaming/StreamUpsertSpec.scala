package graft.streaming

import java.sql.DriverManager
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.io.DerbyUpsert

/** Stream → JDBC upsert end-to-end (MemoryStream → foreachBatch →
  * embedded Derby): micro-batches land via the conflict-skip sink, so a
  * row redelivered in a later batch (at-least-once delivery) inserts
  * exactly once.
  */
class StreamUpsertSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftstreamdb;create=true"
  private def withConn[T](f: java.sql.Connection => T): T = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  test("micro-batches upsert with cross-batch redelivery dedup") {
    withConn(_.createStatement().execute(
      """CREATE TABLE "ev" ("event_id" BIGINT PRIMARY KEY, "user_id" BIGINT)"""))
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val ckpt = java.nio.file.Files.createTempDirectory("stream-upsert").toString
    val q = StreamingOps.upsertStream(
      mem.toDF().toDF("event_id", "user_id"),
      url, new java.util.Properties, "ev", "event_id",
      DerbyUpsert, ckpt)
    try {
      mem.addData((1L, 10L), (2L, 10L))
      q.processAllAvailable()
      // batch 2 redelivers event 2 (at-least-once) plus a new event
      mem.addData((2L, 10L), (3L, 20L))
      q.processAllAvailable()
    } finally q.stop()
    withConn { c =>
      val rs = c.createStatement().executeQuery(
        """SELECT COUNT(*), MIN("event_id"), MAX("event_id") FROM "ev"""")
      rs.next()
      assert(rs.getLong(1) == 3L) // 1, 2, 3 — the redelivered 2 skipped
      assert(rs.getLong(2) == 1L && rs.getLong(3) == 3L)
    }
  }
}
