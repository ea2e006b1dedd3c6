package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.io.JsonTableIO

/** Stream → JSON table artifact end-to-end (MemoryStream → native file
  * sink → manifest finalize): committed part files are the artifact; the
  * finalized manifest count matches; the result round-trips through the
  * same reader the batch sink uses.
  */
class ArtifactStreamSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches land as an artifact; finalize stamps the manifest") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = java.nio.file.Files.createTempDirectory("artifact-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("artifact-ckpt").toString
    val q = StreamingOps.artifactStream(
      mem.toDF().toDF("id", "name"), out, "user", ckpt)
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val m = JsonTableIO.finalizeManifest(spark, out, "user")
    assert(m == JsonTableIO.Manifest("user", 3L))
    assert(JsonTableIO.readManifest(out, "user") == m)
    assert(JsonTableIO.listTables(out) == Seq("user"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    val back = JsonTableIO.read(spark, out, "user", Some(schema))
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))

    // full maintenance lifecycle on the STREAMING artifact: compact must
    // read only the sink's COMMITTED files (the _spark_metadata log rides
    // inside the data dir), rotate into a generation, and keep the rows —
    // after which the artifact is a normal table, closed to this stream
    assert(JsonTableIO.compact(spark, out, "user", 1) == 3L)
    assert(JsonTableIO.readManifest(out, "user").dataDir == "data-g1")
    val compacted = JsonTableIO.read(spark, out, "user", Some(schema))
    assert(compacted.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // re-finalize after compact resolves the generation (no pinned path)
    assert(JsonTableIO.finalizeManifest(spark, out, "user") ==
      JsonTableIO.Manifest("user", 3L, "data-g1"))
  }
}
