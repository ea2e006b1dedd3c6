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
