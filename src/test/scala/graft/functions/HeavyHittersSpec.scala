package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the Misra–Gries THEOREM (est ≤ true ≤ est + err for every item,
  * in any partition/merge order) on data engineered to force the
  * decrement and merge-subtraction paths, plus the classical heavy-hitter
  * containment: any item with true count > err must be stored.
  */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._
  import HeavyHitters._

  // skewed stream: item "hh" dominates, a long tail of 50 singletons×40
  // forces constant counter churn at k=8
  private def stream: Seq[String] =
    Seq.fill(400)("hh") ++
      (0 until 50).flatMap(i => Seq.fill(40)(s"t$i")) ++
      Seq.fill(150)("hh2")

  private def exact: Map[String, Long] =
    stream.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }

  private def sketchOf(parts: Int, k: Int = 8): (Map[String, Long], Long) = {
    val bytes = stream.toDF("w").repartition(parts)
      .agg(mg_sketch_agg(col("w"), k).as("sk"))
      .select(col("sk")).head().getAs[Array[Byte]](0)
    val st = HeavyHitters.deserializeMg(bytes)
    (st.counts.toMap, st.err)
  }

  test("envelope holds for every item, error path genuinely exercised") {
    val (counts, err) = sketchOf(parts = 4)
    assert(err > 0, "k=8 over 52 distinct items must decrement")
    assert(counts.size <= 8)
    exact.foreach { case (w, c) =>
      val est = counts.getOrElse(w, 0L)
      assert(est <= c && c <= est + err, s"$w: est=$est true=$c err=$err")
    }
  }

  test("items with true count above the error bound are always stored") {
    val (counts, err) = sketchOf(parts = 4)
    exact.filter(_._2 > err).keys.foreach { w =>
      assert(counts.contains(w), s"heavy hitter $w missing (err=$err)")
    }
    // the dominant item's estimate is meaningfully tight
    assert(counts("hh") >= exact("hh") - err)
  }

  test("guarantee is partition-count independent") {
    for (p <- Seq(1, 3, 13)) {
      val (counts, err) = sketchOf(parts = p)
      exact.foreach { case (w, c) =>
        val est = counts.getOrElse(w, 0L)
        assert(est <= c && c <= est + err, s"parts=$p $w est=$est c=$c err=$err")
      }
    }
  }

  test("two-level rollup (shard sketches -> mg_sketch_merge) keeps the envelope") {
    val df = stream.zipWithIndex
      .map { case (w, i) => (w, i % 5) }.toDF("w", "shard")
    val bytes = df.groupBy("shard").agg(mg_sketch_agg(col("w"), 8).as("sk"))
      .agg(mg_sketch_merge(col("sk")).as("g"))
      .head().getAs[Array[Byte]](0)
    val st = HeavyHitters.deserializeMg(bytes)
    assert(st.counts.size <= 8)
    exact.foreach { case (w, c) =>
      val est = st.counts.getOrElse(w, 0L)
      assert(est <= c && c <= est + st.err, s"$w est=$est c=$c err=${st.err}")
    }
  }

  test("query expressions match the deserialized state") {
    val sk = stream.toDF("w").agg(mg_sketch_agg(col("w"), 8).as("sk"))
    val row = sk.select(
      mg_estimate(col("sk"), lit("hh")).as("est_hh"),
      mg_estimate(col("sk"), lit("never-seen")).as("est_miss"),
      mg_error(col("sk")).as("err")).head()
    val st = HeavyHitters.deserializeMg(
      sk.head().getAs[Array[Byte]](0))
    assert(row.getLong(0) == st.counts.getOrElse("hh", 0L))
    assert(row.getLong(1) == 0L)
    assert(row.getLong(2) == st.err)
  }

  test("single-partition exact regime: k above distinct count -> err 0, exact counts") {
    val bytes = Seq("a", "b", "a", "c", "a", "b").toDF("w").coalesce(1)
      .agg(mg_sketch_agg(col("w"), 16).as("sk")).head().getAs[Array[Byte]](0)
    val st = HeavyHitters.deserializeMg(bytes)
    assert(st.err == 0L)
    assert(st.counts == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }
}
