package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-13 stats batch: the skyline sweep against a
  * brute-force dominance filter, the [[graft.ext.DistRank]] exclusive
  * prefix-min primitive against a single-pass reference, the
  * t-closeness EMD against hand values, and Cramér's V at its two
  * analytic extremes (perfect association / exact independence).
  */
class SkylineStatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("skyline sweep == brute-force dominance filter on sf0.001") {
    import spark.implicits._
    // replicate the metric stage, then brute-force the dominance test
    val sup = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_suppkey"))
      .agg(floor(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 100).cast("long").as("rev"),
        count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      .withColumn("rate", expr("r * 1000000 div n"))
      .select("l_suppkey", "rev", "rate")
      .as[(Long, Long, Long)].collect()
    val brute = sup.filter { case (_, rev, rate) =>
      !sup.exists { case (_, r2, t2) =>
        r2 >= rev && t2 <= rate && (r2 > rev || t2 < rate)
      }
    }.map { case (k, rev, rate) => (k, rev, rate) }.toSet
    val got = OlapQueries.skylineSuppliers(spark, sf)
      .select(col("suppkey"),
        (col("revenue") * 100).cast("long").as("rev"),
        (col("return_rate") * 1e6).cast("long").as("rate"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute, s"skyline mismatch: got $got want $brute")
    assert(got.nonEmpty)
  }

  test("globalCumMinExcl == single-pass reference on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val xs = Vector.fill(500)(rnd.nextInt(1000).toLong)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val got = graft.ext.DistRank
      .globalCumMinExcl(df, "v", "m", Seq(col("id")))
      .select("id", "m").as[(Long, Option[Long])].collect()
      .sortBy(_._1).map(_._2)
    // reference: exclusive running min in id order
    val ref = xs.scanLeft(Option.empty[Long]) {
      case (None, v)    => Some(v)
      case (Some(m), v) => Some(math.min(m, v))
    }.init
    assert(got.toSeq == ref.toSeq)
  }

  test("t-closeness EMD: hand-crafted split cohorts score exactly 0.5") {
    import spark.implicits._
    // two cohorts, two balance bands; cohort A entirely band 0, cohort B
    // entirely band 1 → q = (.5, .5), p = (1, 0) → EMD = 0.5 for both
    val dir = java.nio.file.Files.createTempDirectory("tclose").toString
    val cust = (1 to 10).map { i =>
      val cohortA = i <= 5
      (i.toLong, if (cohortA) 1 else 2, "SEG",
        if (cohortA) 100.0 else 1100.0) // bands 0 and 1
    }.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    cust.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = graft.ext.CurationQueries.tCloseness(spark, dir)
      .select("c_nationkey", "emd", "t_close")
      .as[(Int, Double, Boolean)].collect().toSet
    assert(rows == Set((1, 0.5, false), (2, 0.5, false)))
  }

  test("t-closeness on the corpus: EMD bounded in [0,1], cohorts complete") {
    val rows = graft.ext.CurationQueries.tCloseness(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val e = r.getAs[Double]("emd"); e >= 0.0 && e <= 1.0
    })
    val total = rows.map(_.getAs[Long]("cohort_n")).sum
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total == nCust)
  }

  test("Theil decomposition: zero within equal nations, hand between-term") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("theil").toString
    // nation 1: two customers spending 10.00 each; nation 2: two at
    // 30.00 → within-Theil is EXACTLY 0 (x·n_g = X_g per customer);
    // the between terms re-derive from the same ln-micros formula
    Seq((1L, 1), (2L, 1), (3L, 2), (4L, 2))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 10.0), (2L, 10.0), (3L, 30.0), (4L, 30.0))
      .toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def lnm(v: Double) = math.floor(math.log(v) * 1e6).toLong
    def between(xg: Long, ng: Long, xx: Long, nn: Long) = {
      val num = xg * (lnm(xg.toDouble * nn) - lnm(xx.toDouble * ng))
      (if (num >= 0) num / xx else -((-num) / xx)) / 1e6
    }
    val got = OlapQueries.theilDecomp(spark, dir)
      .select("c_nationkey", "n_cust", "revenue_share", "t_within",
        "between_contrib")
      .as[(Int, Long, Double, Double, Double)].collect().toList
    assert(got == List(
      (1, 2L, 0.25, 0.0, between(2000, 2, 8000, 4)),
      (2, 2L, 0.75, 0.0, between(6000, 2, 8000, 4))), s"got $got")
    // the between terms sum to (approximately) the population-level
    // mean-log-deviation of the two nation means — sign sanity only
    assert(got.map(_._5).sum > 0)
  }

  test("Cramér's V: 1 at perfect association, 0 at exact independence") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cramers").toString
    // perfect association: segment decides priority 1:1, 2×2, balanced
    (1 to 8).map(i => (i.toLong, if (i % 2 == 0) "A" else "B"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    (1 to 8).map(i => (i.toLong, if (i % 2 == 0) "1-URGENT" else "5-LOW"))
      .toDF("o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val perfect = OlapQueries.cramersV(spark, dir)
      .select("cramers_v", "dof").as[(Double, Long)].collect().head
    assert(perfect == ((1.0, 1L)), s"got $perfect")
    // exact independence: every (segment, priority) cell equal count
    val cells = for {
      s <- Seq("A", "B"); p <- Seq("1-URGENT", "5-LOW"); k <- 1 to 2
    } yield (s, p, k)
    cells.zipWithIndex.map { case ((s, _, _), i) => (i.toLong, s) }
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    cells.zipWithIndex.map { case ((_, p, _), i) => (i.toLong, p) }
      .toDF("o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val indep = OlapQueries.cramersV(spark, dir)
      .select("cramers_v").as[Double].collect().head
    assert(indep == 0.0, s"got $indep")
  }
}
