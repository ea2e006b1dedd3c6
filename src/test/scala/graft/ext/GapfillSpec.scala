package graft.ext

import java.sql.Timestamp

import graft.SparkSpec

/** The synthetic events table is DENSE (every type has every day), so
  * the registered `events_gapfill` oracle only proves the no-gap case.
  * This spec PLANTS gaps and pins the two behaviors the query exists
  * for: a missing day materializes as an explicit `n = 0` row, and the
  * last observed daily total carries forward across the gap (staying
  * NULL before the first observation).
  */
class GapfillSpec extends SparkSpec {

  test("planted gaps: zero rows appear, totals carry forward") {
    val tmp = java.nio.file.Files.createTempDirectory("gapfill").toString
    try {
      import spark.implicits._
      def t(d: String) = Timestamp.valueOf(s"2024-01-0$d 10:00:00")
      // type A: days 1 and 4 (gap at 2–3); type B: day 2 only
      Seq(
        (t("1"), "A", 10.0), (t("1"), "A", 5.0),
        (t("4"), "A", 7.0),
        (t("2"), "B", 3.0))
        .toDF("ts", "event_type", "value")
        .write.parquet(s"$tmp/events.parquet")

      val rows = EventQueries.eventsGapfill(spark, tmp).collect()
        .map(r => (r.getString(0), r.getDate(1).toString,
          r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))

      // calendar spans day 1..4 for BOTH types (global span)
      assert(rows.length == 8)
      val a = rows.filter(_._1 == "A").map(x => (x._2, x._3, x._4))
      assert(a.toSeq == Seq(
        ("2024-01-01", 2L, Some(15.0)),  // observed
        ("2024-01-02", 0L, Some(15.0)),  // gap: zero count, carried total
        ("2024-01-03", 0L, Some(15.0)),
        ("2024-01-04", 1L, Some(7.0)))) // new observation replaces carry
      val b = rows.filter(_._1 == "B").map(x => (x._2, x._3, x._4))
      assert(b.toSeq == Seq(
        ("2024-01-01", 0L, None),        // before first observation: NULL
        ("2024-01-02", 1L, Some(3.0)),
        ("2024-01-03", 0L, Some(3.0)),
        ("2024-01-04", 0L, Some(3.0))))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }
}
