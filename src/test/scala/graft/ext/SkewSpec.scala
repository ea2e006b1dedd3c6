package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Salting must be a pure physical rewrite: same results as the plain
  * join/agg, hot key spread across `salt` sub-keys.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 'hot' carries 90% of rows — the celebrity-key shape
  private lazy val facts = ((1 to 900).map(i => (i.toLong, "hot")) ++
    (901 to 1000).map(i => (i.toLong, s"k${i % 7}")))
    .toDF("row_id", "key")
  private lazy val dim = (Seq("hot") ++ (0 until 7).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, s"payload$i") }
    .toDF("key", "payload")

  test("AQE skew-join splits the hot partition at runtime") {
    // the OTHER half of the skew story (SCALE.md): explicit salting is
    // the planned fix, AQE's OptimizeSkewedJoin is the runtime one —
    // with thresholds scaled to test data, the post-execution plan must
    // carry the skew=true SMJ marker and the result must equal the
    // plain join
    val conf = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = conf.map { case (k, _) => k -> spark.conf.getOption(k) }
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~50k hot rows with a fat payload so the hot partition clears the
      // 16KB skew threshold while the others stay tiny
      val bigFacts = spark.range(50000)
        .select(col("id").as("row_id"),
          when(col("id") < 45000, "hot")
            .otherwise(concat(lit("k"), pmod(col("id"), lit(7)))).as("key"),
          expr("repeat('x', 64)").as("pad"))
      val joined = bigFacts.join(dim, Seq("key"))
      // execute THIS plan (count() builds its own QueryExecution and the
      // adaptive final plan would never materialize on `joined`)
      val n = joined.collect().length
      assert(n == 50000) // every key (hot, k0..k6) has a dim row
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin equals the plain join") {
    val plain = facts.join(dim, Seq("key")).select("row_id", "key", "payload")
    val salted = Skew.saltedJoin(facts, dim, "key", salt = 8,
      probeUnique = "row_id").select("row_id", "key", "payload")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt scatters the hot key across sub-keys deterministically") {
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(col("row_id")), lit(8L)))
    val spread = salted.filter(col("key") === "hot")
      .groupBy("__salt").count().count()
    assert(spread == 8L) // all 8 sub-keys used
    // deterministic: same expression twice -> identical assignment
    val again = facts.withColumn("__salt2",
      pmod(xxhash64(col("row_id")), lit(8L)))
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8L)))
    assert(again.filter(col("__salt") =!= col("__salt2")).isEmpty)
  }

  test("saltedAgg matches single-phase aggregation") {
    val plain = facts.groupBy("key").agg(count(lit(1)).as("agg"))
    val salted = Skew.saltedAgg(facts, "key", salt = 8, uniqueCol = "row_id",
      partial = count(lit(1)), merge = c => sum(c))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
