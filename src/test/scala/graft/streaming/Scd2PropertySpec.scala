package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.SparkSpec

/** Property pin: streaming SCD2 == batch SCD2 on random event streams
  * delivered in random micro-batch splits. The batch operator is the
  * DuckDB-oracle-gated `scd2_state`; the stream must reproduce its
  * closed intervals exactly (the open interval per user stays in state
  * — the batch form's NULL-open rows), for any in-order batch cut.
  */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int): Seq[T] = {
    val seed0 = rng.Seed(977L)
    Iterator.iterate((g.pureApply(Gen.Parameters.default, seed0), seed0.next)) {
      case (_, s) => (g.pureApply(Gen.Parameters.default, s), s.next)
    }.map(_._1).take(n).toSeq
  }

  private val genCase: Gen[(Seq[Ev], Seq[Int])] = for {
    n <- Gen.choose(4, 24)
    users <- Gen.listOfN(n, Gen.choose(1L, 3L))
    types <- Gen.listOfN(n, Gen.oneOf("click", "view", "buy"))
    // strictly increasing ts per event index keeps the in-order
    // delivery contract; event_id breaks any residual ties
    cuts <- Gen.listOfN(2, Gen.choose(1, math.max(n - 1, 1)))
  } yield {
    val evs = (0 until n).map { i =>
      Ev(i.toLong, new Timestamp(1704100000000L + i * 60000L),
        users(i), types(i), 1.0, "{}")
    }
    (evs, cuts.distinct.sorted)
  }

  test("streamed closed intervals == batch non-NULL rows for random streams and batch cuts") {
    cases(genCase, 6).zipWithIndex.foreach { case ((evs, cuts), ci) =>
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Ev]
      val qn = s"scd2_prop_$ci"
      val q = StreamingOps.scd2Stream(mem.toDF())
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      try {
        val slices = (0 +: cuts :+ evs.size).distinct.sorted
          .sliding(2).map { case Seq(a, b) => evs.slice(a, b) }
          .filter(_.nonEmpty)
        slices.foreach { s => mem.addData(s: _*); q.processAllAvailable() }
        val streamed = spark.table(qn)
          .collect().map(r => (r.getLong(0), r.getString(1),
            r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toSet

        val dir = java.nio.file.Files.createTempDirectory("scd2prop").toString
        try {
          evs.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
          val batchClosed = graft.ext.EventQueries.scd2State(spark, dir)
            .filter(col("valid_to").isNotNull)
            .collect().map(r => (r.getLong(0), r.getString(1),
              r.getTimestamp(2), r.getTimestamp(3), r.getLong(4))).toSet
          assert(streamed == batchClosed,
            s"case $ci: streamed=$streamed batch=$batchClosed cuts=$cuts n=${evs.size}")
        } finally {
          import scala.reflect.io.Directory
          new Directory(new java.io.File(dir)).deleteRecursively()
        }
      } finally q.stop()
    }
  }
}
