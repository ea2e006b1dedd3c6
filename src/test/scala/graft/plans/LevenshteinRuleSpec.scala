package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[LevenshteinThresholdRule]] must (1) preserve semantics exactly on
  * an adversarial grid — boundary distances, NULLs, empties, length
  * gaps — (2) actually fire on the DataFrame-API predicate shape
  * `levenshtein(a,b).cast("long") <= 2`, and (3) be idempotent (the
  * rewritten predicate carries a threshold, so the pattern can't
  * re-fire and stack guards).
  */
class LevenshteinRuleSpec extends SparkSpec {

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ LevenshteinThresholdRule
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq LevenshteinThresholdRule)
  }

  private def grid = {
    import spark.implicits._
    val vals = Seq(Some("kitten"), Some("sitting"), Some("kitte"),
      Some("kittens"), Some(""), Some("a"), Some("abcdefgh"), None)
    (for (a <- vals; b <- vals) yield (a, b)).toDF("a", "b")
  }

  test("rewrite preserves semantics on boundary/NULL/empty grid") {
    for (k <- Seq(0, 1, 2, 3, 7)) {
      val plain = grid
        .filter(levenshtein(col("a"), col("b")) <= k)
        .collect().map(_.toSeq).toSet
      val rewritten = withRule {
        grid.filter(levenshtein(col("a"), col("b")) <= k)
          .collect().map(_.toSeq).toSet
      }
      assert(rewritten == plain, s"k=$k")
    }
  }

  test("rule fires on the cast-to-long shape and plans the banded form") {
    // a parquet-backed source: a LocalRelation grid would be constant-
    // folded to nothing before the optimized plan can be inspected
    def q = graft.Tables(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_name").as("a"), reverse(col("p_name")).as("b"))
      .filter(levenshtein(col("a"), col("b")).cast("long") <= 2L)
    val want = q.collect().map(_.toSeq).toSet
    withRule {
      val optimized = q.queryExecution.optimizedPlan.toString
      // threshold arg present (prints as Some(2)); plus the length guard
      assert(optimized.contains("Some(2)") && optimized.contains("levenshtein("),
        s"banded form missing:\n$optimized")
      assert(optimized.contains("abs(") && optimized.contains("length("),
        s"length guard missing:\n$optimized")
      assert(q.collect().map(_.toSeq).toSet == want)
    }
  }

  test("idempotent: a second application is a no-op") {
    val df = grid.filter(levenshtein(col("a"), col("b")) <= 2)
    val once = LevenshteinThresholdRule(df.queryExecution.analyzed)
    val twice = LevenshteinThresholdRule(once)
    assert(twice.fastEquals(once))
    // and the once-rewritten condition no longer matches the pattern
    assert(once.toString.contains("Some(2)"))
  }

  test("fuzzy_dup_pairs result is unchanged under the rule") {
    val dir = "/root/testdata/sf0.001"
    val plain = graft.ext.DedupQueries.fuzzyDupPairs(spark, dir)
      .collect().map(_.toSeq).toSeq
    val ruled = withRule {
      graft.ext.DedupQueries.fuzzyDupPairs(spark, dir)
        .collect().map(_.toSeq).toSeq
    }
    assert(ruled == plain && plain.nonEmpty)
  }
}
