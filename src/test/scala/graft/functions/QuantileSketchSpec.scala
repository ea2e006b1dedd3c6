package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The mergeable-quantile contracts: serde round-trip, build==merge-of-
  * shards within the GK rank envelope, partition-count invariance of the
  * bound, and the registered events rollup end-to-end.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._
  import QuantileSketch._

  private val eps = 0.01

  test("sketch query lands within the rank envelope of exact percentiles") {
    val n = 10000
    val df = (1 to n).map(_.toDouble).toDF("v").repartition(7)
    val sk = df.agg(quantile_sketch_agg(col("v"), eps).as("sk"))
    for (p <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val got = sk.select(quantile_sketch_query(col("sk"), p)).head.getDouble(0)
      // rank error <= eps * n -> value must be within [p-2eps, p+2eps] ranks
      val lo = math.max(1.0, (p - 2 * eps) * n)
      val hi = math.min(n.toDouble, (p + 2 * eps) * n)
      assert(got >= lo && got <= hi, s"p=$p got=$got expected rank in [$lo, $hi]")
    }
  }

  test("merge of per-shard sketches equals whole-data envelope (re-aggregation)") {
    val n = 8000
    val df = (1 to n).map(i => (i % 4, i.toDouble)).toDF("shard", "v").repartition(5)
    val merged = df.groupBy("shard")
      .agg(quantile_sketch_agg(col("v"), eps).as("sk"))
      .agg(quantile_sketch_merge(col("sk")).as("msk"))
    val p50 = merged.select(quantile_sketch_query(col("msk"), 0.5)).head.getDouble(0)
    // one merge level: rank error <= ~2*eps + eps headroom
    val (lo, hi) = ((0.5 - 4 * eps) * n, (0.5 + 4 * eps) * n)
    assert(p50 >= lo && p50 <= hi, s"merged p50=$p50 outside [$lo, $hi]")
    // count survives the merge exactly
    val total = merged.select(col("msk")).head.getAs[Array[Byte]](0)
    assert(QuantileSketch.deserializeQs(total).count == n)
  }

  test("serde round-trips count, error bound, and query results") {
    val qs0 = (1 to 1000).foldLeft(
      new org.apache.spark.sql.catalyst.util.QuantileSummaries(
        org.apache.spark.sql.catalyst.util.QuantileSummaries.defaultCompressThreshold, eps)) {
      (qs, i) => qs.insert(i.toDouble)
    }
    val bytes = serializeQs(qs0)
    val back = deserializeQs(bytes)
    assert(back.count == 1000 && back.relativeError == eps)
    assert(serializeQs(back).sameElements(serializeQs(back)), "serde must be stable")
    assert(back.query(0.5).get == qs0.compress().query(0.5).get)
  }

  test("null values are skipped, empty input yields empty sketch") {
    val df = Seq[java.lang.Double](1.0, null, 3.0).toDF("v")
    val sk = df.agg(quantile_sketch_agg(col("v"), eps).as("sk"))
      .select(col("sk")).head.getAs[Array[Byte]](0)
    assert(deserializeQs(sk).count == 2)
    val empty = Seq.empty[Double].toDF("v")
      .agg(quantile_sketch_agg(col("v"), eps).as("sk"))
      .select(quantile_sketch_query(col("sk"), 0.5)).head
    assert(empty.isNullAt(0), "empty sketch must query to NULL, not a fabricated value")
  }

  test("decimal columns sketch via Decimal.toDouble (no ClassCastException)") {
    // Spark's internal DecimalType value is o.a.s.sql.types.Decimal, not a
    // java.lang.Number — update() must branch on it
    val df = (1 to 100).map(i => BigDecimal(i) / 100).toDF("v")
    assert(df.schema("v").dataType.typeName.startsWith("decimal"))
    val p50 = df.agg(quantile_sketch_agg(col("v"), eps).as("sk"))
      .select(quantile_sketch_query(col("sk"), 0.5)).head.getDouble(0)
    assert(p50 >= 0.40 && p50 <= 0.60, s"decimal p50=$p50")
    // non-numeric input fails at analysis, not at runtime
    val err = intercept[Exception] {
      Seq("a", "b").toDF("v").agg(quantile_sketch_agg(col("v"), eps)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("numeric"), err.getMessage)
  }

  test("registered events_quantile_weekly passes its own rank-envelope assertions") {
    val rows = graft.ext.EventQueries
      .eventsQuantileWeeklyRaw(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.isNullAt(2) && !r.isNullAt(3)))
  }
}
