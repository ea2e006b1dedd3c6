package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the rank-statistics + Shapley batch: Kendall's τ-b against an
  * all-pairs brute force on sf0.001, Spearman/Kruskal–Wallis/log-rank
  * against hand-computed values on crafted tables, and the Shapley
  * attribution against an independent coalition-enumeration on
  * sf0.001 plus its efficiency axiom.
  */
class StatsQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("kendall_tau == all-pairs brute force on sf0.001") {
    import spark.implicits._
    val xs = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_quantity").cast("long"),
        floor(col("l_discount").cast("decimal(18,4)") * 100).cast("long"))
      .as[(Long, Long)].collect()
    var c = 0L; var d = 0L
    var i = 0
    while (i < xs.length) {
      var j = i + 1
      while (j < xs.length) {
        val (qa, da) = xs(i); val (qb, db) = xs(j)
        if (qa != qb && da != db) {
          if ((qa < qb) == (da < db)) c += 1 else d += 1
        }
        j += 1
      }
      i += 1
    }
    val n = xs.length.toLong
    val tx2 = xs.groupBy(_._1).values.map(g => g.length.toLong * (g.length - 1)).sum
    val ty2 = xs.groupBy(_._2).values.map(g => g.length.toLong * (g.length - 1)).sum
    val n02 = n * (n - 1)
    val wantTau = BigDecimal(2.0 * (c - d) /
      math.sqrt((n02 - tx2).toDouble * (n02 - ty2).toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = StatsQueries.kendallTau(spark, sf)
      .select("n", "concordant_share", "discordant_share", "tau_b")
      .as[(Long, Double, Double, Double)].head()
    assert(got._1 == n)
    assert(got._2 == (2 * c * 1000000L / n02) / 1e6)
    assert(got._3 == (2 * d * 1000000L / n02) / 1e6)
    assert(math.abs(got._4 - wantTau) < 1e-9, s"tau got ${got._4} want $wantTau")
  }

  test("spearman_corr: hand case with a y-tie scores 0.866025") {
    import spark.implicits._
    // cust1: 1 order, spend 10.00; cust2: 2 orders, spend 10.00 (y tie
    // with cust1); cust3: 3 orders, spend 60.00.
    // x ranks (1,2,3); y tie-averaged ranks (1.5, 1.5, 3)
    // → ρ = 1.5/√(2·1.5) = 0.8660254 → 0.866025
    val dir = java.nio.file.Files.createTempDirectory("spearman").toString
    val rows = Seq((1L, 10.00), (2L, 5.00), (2L, 5.00),
      (3L, 20.00), (3L, 20.00), (3L, 20.00))
    rows.toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsQueries.spearmanCorr(spark, dir)
      .as[(Long, Double)].head()
    assert(got == ((3L, 0.866025)))
  }

  test("spearman_corr: perfectly monotone pair scores exactly 1.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spearman1").toString
    val rows = (1 to 5).flatMap(i => Seq.fill(i)((i.toLong, i * 7.0)))
    rows.toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsQueries.spearmanCorr(spark, dir)
      .as[(Long, Double)].head()
    assert(got == ((5L, 1.0)))
  }

  test("kruskal_wallis: two clean-split groups of two score H = 2.4") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kw").toString
    Seq((1L, 1.00, "A"), (2L, 2.00, "A"), (3L, 3.00, "B"), (4L, 4.00, "B"))
      .toDF("o_custkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsQueries.kruskalWallis(spark, dir)
      .select("o_orderpriority", "n_group", "mean_rank", "h", "dof")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(got == Seq(("A", 2L, 1.5, 2.4, 1L), ("B", 2L, 3.5, 2.4, 1L)))
  }

  test("logrank_test: hand-crafted two-cohort risk table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("logrank").toString
    Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // c1 (BUILDING): orders day 0, day 10 → gap 10 (event), censored 0
    // c2 (other):    orders day 0, day 5  → gap 5 (event), censored 5
    Seq((1L, "1995-01-01", 1L), (1L, "1995-01-11", 2L),
      (2L, "1995-01-01", 3L), (2L, "1995-01-06", 4L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsQueries.logrankTest(spark, dir)
      .select("n_building", "n_rest", "observed_events",
        "expected_events", "chi2")
      .as[(Long, Long, Long, Double, Double)].head()
    // risk sets: t=5 → n=3, n1=1 (e1μ = 333333, vμ = 222222);
    // t=10 → n=1, n1=1 (e1μ = 10⁶, v = 0). O₁ = 1, E₁ = 1.333333
    assert(got._1 == 1L && got._2 == 2L && got._3 == 1L)
    assert(got._4 == 1.333333)
    val wantChi2 = BigDecimal(
      math.pow(1.0 - 1333333.0 / 1e6, 2) / (222222.0 / 1e6))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._5 == wantChi2)
  }

  test("diff_in_diff: hand 2x2 grid estimates the treatment effect exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("did").toString
    Seq((1L, 0L), (2L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // treated (nation 0): 10.00 pre → 30.00 post; control: 20.00 → 25.00
    // DiD = (30 − 10) − (25 − 20) = 15
    Seq((1L, "1997-01-01", 10.00), (1L, "1999-01-01", 30.00),
      (2L, "1997-01-01", 20.00), (2L, "1999-01-01", 25.00))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = StatsQueries.diffInDiff(spark, dir)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double, Double)]
      .head()
    assert(got == ((1L, 1L, 1L, 1L, 10.0, 30.0, 20.0, 25.0, 15.0)))
  }

  test("attribution_shapley: zero-journey corpus degrades to zero shares") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("shap0").toString
    // views only — no purchase ever converts, so the coalition lattice
    // is all-zero and every division must hit its greatest() guard
    Seq((1L, java.sql.Timestamp.valueOf("1995-01-01 00:00:00"), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = StatsQueries.attributionShapley(spark, dir)
      .select("channel", "n_journeys", "phi_sixths", "share")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("click", 0L, 0L, 0.0), ("signup", 0L, 0L, 0.0),
      ("view", 0L, 0L, 0.0)))
  }

  test("granger_daily: lag-1 predictive series is detected exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("granger").toString
    // purchases track yesterday's views plus a small alternating
    // residual (an EXACT copy makes RSS_u = 0 and F infinite — both
    // engines correctly return NULL there, so the spec needs noise)
    val x = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3)
    val y = 2 +: x.init.zipWithIndex.map { case (v, i) => v + ((i + 1) % 2) }
    val rows = (0 until 10).flatMap { t =>
      val day = f"1995-01-${t + 1}%02d 00:00:00"
      Seq.fill(x(t))(("view", day)) ++ Seq.fill(y(t))(("purchase", day))
    }.zipWithIndex.map { case ((et, day), i) =>
      (i.toLong, java.sql.Timestamp.valueOf(day), i.toLong, et) }
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // brute-force the same closed-form OLS F on the 9 lag pairs
    val pairs = (1 until 10).map(t => (y(t).toLong, y(t - 1).toLong, x(t - 1).toLong))
    val n = pairs.size.toLong
    def s(f: ((Long, Long, Long)) => Long): Long = pairs.map(f).sum
    val (sy, s1, s2) = (s(_._1), s(_._2), s(_._3))
    val (syy, s11, s22) = (s(p => p._1 * p._1), s(p => p._2 * p._2),
      s(p => p._3 * p._3))
    val (sy1, sy2, s12) = (s(p => p._1 * p._2), s(p => p._1 * p._3),
      s(p => p._2 * p._3))
    val (cyy, c11, c22) = ((n * syy - sy * sy).toDouble,
      (n * s11 - s1 * s1).toDouble, (n * s22 - s2 * s2).toDouble)
    val (cy1, cy2, c12) = ((n * sy1 - sy * s1).toDouble,
      (n * sy2 - sy * s2).toDouble, (n * s12 - s1 * s2).toDouble)
    val det = c11 * c22 - c12 * c12
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rssR = cyy - cy1 * cy1 / c11
    val rssU = cyy - (cy1 * cy1 * c22 + cy2 * cy2 * c11
      - 2 * cy1 * cy2 * c12) / det
    val want = (n, r6((cy1 * c22 - cy2 * c12) / det),
      r6((cy2 * c11 - cy1 * c12) / det),
      r6((rssR - rssU) * (n - 3) / rssU))
    val got = StatsQueries.grangerDaily(spark, dir)
      .as[(Long, Double, Double, Double, Boolean)].head()
    assert((got._1, got._2, got._3, got._4) == want,
      s"granger mismatch: got $got want $want")
    assert(got._5, "perfect lag-1 predictor must be significant")
    assert(math.abs(got._3 - 1.0) < 0.2, "x-lag coefficient should be near 1")
  }

  test("ann_label_ndcg == brute-force NDCG on sf0.001") {
    import spark.implicits._
    val discs = Array(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding")
      .as[(Long, String, Seq[Float])].collect()
      .map { case (id, l, v) => (id, l, v.map(_.toDouble).toArray) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = vecs.filter(_._1 < 5).sortBy(_._1).map { case (qid, ql, qv) =>
      val top = vecs.filter(_._1 != qid)
        .map { case (id, l, v) => (id, l, cos(qv, v)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(10)
      val dcg = top.zipWithIndex.map { case ((_, l, _), i) =>
        if (l == ql) discs(i) else 0L }.sum
      (qid, ql, top.count(_._2 == ql).toLong, (dcg * 1000000L / 4543554L) / 1e6)
    }.toSeq
    val got = SimilarityQueries.annLabelNdcg(spark, sf)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got == want, s"ndcg mismatch:\n got $got\nwant $want")
  }

  test("confusion_matrix agrees with quality_classifier's keep flags") {
    import spark.implicits._
    // independent path: join the registered classifier's per-doc keep
    // flags with the lang truth and count the four cells directly
    val keeps = TextQueries.qualityClassifier(spark, sf)
      .select(col("doc_id"), col("keep"))
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), (col("lang") === "en").as("pos"))
    val cells = keeps.join(truth, Seq("doc_id"))
      .select("keep", "pos").as[(Boolean, Boolean)].collect()
    val tp = cells.count(c => c._1 && c._2).toLong
    val fp = cells.count(c => c._1 && !c._2).toLong
    val fn = cells.count(c => !c._1 && c._2).toLong
    val tn = cells.count(c => !c._1 && !c._2).toLong
    val got = TextQueries.confusionMatrix(spark, sf)
      .select("tp", "fp", "fn", "tn", "f1")
      .as[(Long, Long, Long, Long, Double)].head()
    assert((got._1, got._2, got._3, got._4) == ((tp, fp, fn, tn)))
    assert(got._5 == (2 * tp * 1000000L / math.max(2 * tp + fp + fn, 1L)) / 1e6)
    assert(tp + fp + fn + tn == cells.length)
  }

  test("lift_curve invariants on sf0.001") {
    import spark.implicits._
    val rows = graft.ext.TextQueries.liftCurve(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Seq(1L, 5L, 10L, 25L, 50L))
    for ((pct, quota, nSel, nPos, prec, recall, lift) <- rows) {
      assert(nSel <= quota, s"pct $pct selected $nSel over quota $quota")
      assert(nPos <= nSel)
      assert(prec >= 0.0 && prec <= 1.0)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(lift >= 0.0)
    }
    // selection and capture are monotone in the quota
    assert(rows.map(_._3) == rows.map(_._3).sorted)
    assert(rows.map(_._4) == rows.map(_._4).sorted)
    // a whole-group-prefix cut never leaves the quota more than one
    // tie-group short: the 50% cut must select something
    assert(rows.last._3 > 0)
  }

  test("attribution_shapley == independent coalition enumeration on sf0.001") {
    import spark.implicits._
    // independent journey→mask reduction, then brute Shapley over the
    // 8-coalition lattice with exact sixth-weights
    val ev = graft.Tables(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val t = ev.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("ts").as("t_ts"), col("event_type").as("tt"))
    val masks = p.join(t, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= expr("p_ts - INTERVAL 7 DAY"))
      .groupBy("p_id")
      .agg((max(when(col("tt") === "view", 1L).otherwise(0L))
        + max(when(col("tt") === "click", 2L).otherwise(0L))
        + max(when(col("tt") === "signup", 4L).otherwise(0L))).as("m"))
      .groupBy("m").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    def v(s: Long): Long =
      masks.collect { case (m, c) if (s & m) == m => c }.sum
    def phi6(bit: Long): Long =
      (0L to 7L).filter(s => (s & bit) == 0).map { s =>
        val w = java.lang.Long.bitCount(s) match {
          case 0 => 2L; case 1 => 1L; case _ => 2L
        }
        w * (v(s | bit) - v(s))
      }.sum
    val want = Map("view" -> phi6(1), "click" -> phi6(2),
      "signup" -> phi6(4))
    val got = StatsQueries.attributionShapley(spark, sf)
      .select("channel", "phi_sixths", "n_journeys")
      .as[(String, Long, Long)].collect()
    assert(got.map(r => r._1 -> r._2).toMap == want)
    // efficiency axiom: Σφ = v(full lattice) = all attributed journeys
    assert(got.map(_._2).sum == 6 * v(7))
    assert(got.forall(_._3 == v(7)))
    assert(v(7) > 0)
  }
}
