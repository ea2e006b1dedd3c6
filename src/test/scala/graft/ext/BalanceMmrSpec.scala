package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the two r9 sequential-over-bounded-state operators:
  * `running_capped_balance`'s clamped fold against a plain-Scala
  * replica of the fold on the real corpus, and `mmr_diversify`'s
  * greedy invariants (the full selection is pinned value-exactly by
  * the DuckDB oracle; here we pin the properties that make it MMR).
  */
class BalanceMmrSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("capped balance == plain-Scala clamped fold over sorted history") {
    val got = EventQueries.runningCappedBalance(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    val raw = graft.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(1)
        // full-precision micros: getTime() floors nanos to millis
        val micros = Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        (r.getLong(0), micros, r.getLong(2), r.getDouble(3))
      }
    val want = raw.groupBy(_._1).map { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      var bal = 0L; var floored = 0L; var capped = 0L
      ordered.foreach { case (_, _, eid, v) =>
        // Spark's Round(double) contract: BigDecimal.valueOf + HALF_UP
        val cents = java.math.BigDecimal.valueOf(v * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
        val delta = if (eid % 2 == 0) cents else -cents
        val next = bal + delta
        if (next < 0L) floored += 1
        if (next > 1000000L) capped += 1
        bal = math.min(math.max(next, 0L), 1000000L)
      }
      uid -> ((bal, floored, capped))
    }
    assert(got == want)
    // the clamp must actually engage somewhere, or the test is vacuous
    assert(got.values.exists(_._2 > 0), "no user ever hit the floor")
  }

  test("MMR selection is relevance-anchored, duplicate-free, and diversified") {
    val rows = SimilarityQueries.mmrDiversify(spark, sfDir).collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 8L))
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == ids.length)
    assert(!ids.contains(0L), "the query vector must not retrieve itself")
    // rank 1 is pure relevance: the global top-rel candidate
    val rels = rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(rows.head.getDouble(3) == rows.head.getDouble(2))
    // every later score is rel − λ·maxsim with maxsim ∈ [−1, 1]
    // (a NEGATIVE max-sim legitimately pushes score above rel), so the
    // adjustment is bounded by λ = 0.5
    rows.tail.foreach(r =>
      assert(math.abs(r.getDouble(3) - r.getDouble(2)) <= 0.5 + 1e-12))
    // the penalty term must actually engage somewhere on this corpus
    assert(rels.size == 8)
    assert(rows.tail.exists(r => r.getDouble(3) != r.getDouble(2)),
      "no selection ever saw a similarity adjustment — λ inert?")
  }
}
