package graft.ext

import graft.SparkSpec

/** Model-behavior pins for the fixed-point Holt–Winters recurrence on
  * crafted series (the cross-engine replay itself is the hard gate;
  * these pin that the model MEANS what it claims).
  */
class HoltWintersSpec extends SparkSpec {

  private def day(i: Int): java.sql.Date =
    java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i))

  private def series(ys: Seq[Long]): Seq[(java.sql.Date, Long)] =
    ys.zipWithIndex.map { case (y, i) => (day(i), y) }

  test("constant series: level locks to y, trend to ~0, fit == y") {
    val out = EventQueries.hwFold(series(Seq.fill(21)(100L)))
    assert(out.length == 14)
    for ((_, y, fit, l, b) <- out) {
      assert(y == 100L)
      assert(fit == 100L * 1000000, s"fit drifted: $fit")
      assert(l == 100L * 1000000)
      assert(b == 0L)
    }
  }

  test("level step: level converges toward the new plateau") {
    val out = EventQueries.hwFold(series(
      Seq.fill(14)(100L) ++ Seq.fill(14)(200L)))
    val lastLevel = out.last._4 / 1e6
    assert(lastLevel > 180, s"level stuck at $lastLevel")
    // and the first post-step forecast is still near the old plateau
    val stepFit = out.find(_._1 == day(14)).get._3 / 1e6
    assert(stepFit < 120, s"one-step-ahead forecast leaked the future: $stepFit")
  }

  test("weekly pattern: seasonal fit tracks the period-7 cycle") {
    // y = 100 on weekdays-position 0..4, 10 on positions 5..6
    val ys = (0 until 28).map(i => if (i % 7 < 5) 100L else 10L)
    val out = EventQueries.hwFold(series(ys))
    // after two full cycles the fit must be within 25% of the actual
    // on BOTH the high and low phase
    val tail = out.takeRight(7)
    for ((d, y, fit, _, _) <- tail) {
      val f = fit / 1e6
      assert(math.abs(f - y) <= 0.25 * y + 10,
        s"$d: fit $f vs actual $y")
    }
  }

  test("short series yields no rows; 8th day is the first emission") {
    assert(EventQueries.hwFold(series(Seq.fill(7)(5L))).isEmpty)
    val out = EventQueries.hwFold(series(Seq.fill(8)(5L)))
    assert(out.length == 1 && out.head._1 == day(7))
  }
}
