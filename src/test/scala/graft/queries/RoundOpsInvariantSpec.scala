package graft.queries

import graft.SparkSpec

/** Structural invariants for the round-9 operator additions, at
  * sf0.001 — the algebraic properties the DuckDB hash gate can't state
  * (it proves engine agreement, not that the MATH is the right math).
  * Each assertion is a law of the estimator itself: a survival curve
  * may never rise, a decomposition must re-add to its input exactly,
  * attribution credit is conserved, a k-core can only shrink.
  */
class RoundOpsInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def rows(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("survival_km: monotone non-increasing, risk set shrinks") {
    val r = rows("survival_km")
    assert(r.nonEmpty)
    val surv = r.map(_.getAs[Double]("survival"))
    assert(surv.head <= 1.0 + 1e-9)
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a + 1e-9 })
    val risk = r.map(_.getAs[Long]("n_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b <= a })
  }

  test("gini_nation and supplier_hhi live in [0, 1)") {
    val g = rows("gini_nation")
    assert(g.nonEmpty)
    assert(g.forall { r =>
      val v = r.getAs[Double]("gini"); v >= 0.0 && v < 1.0
    })
    val h = rows("supplier_hhi")
    assert(h.nonEmpty)
    assert(h.forall { r =>
      val v = r.getAs[Double]("hhi"); v > 0.0 && v <= 1.0 + 1e-9
    })
  }

  test("classifier_calibration partitions the corpus") {
    val r = rows("classifier_calibration")
    val total = r.map(_.getAs[Long]("n")).sum
    val nDocs = graft.Tables(spark, dir, "documents").count()
    assert(total == nDocs)
    assert(r.forall { x =>
      val b = x.getAs[Long]("bin"); b >= 0 && b <= 9
    })
    assert(r.forall { x =>
      val p = x.getAs[Double]("pos_rate"); p >= 0.0 && p <= 1.0
    })
  }

  test("nb_lang_classify confusion counts cover the tokenized corpus") {
    val r = rows("nb_lang_classify")
    assert(r.nonEmpty)
    val n = r.map(_.getAs[Long]("n")).sum
    assert(n > 0 && n <= graft.Tables(spark, dir, "documents").count())
  }

  test("bootstrap_ci: ordered bounds, B recorded") {
    val r = rows("bootstrap_ci").head
    assert(r.getAs[Long]("b") == 100L)
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("ci_hi"))
    assert(r.getAs[Double]("mean_tokens") > 0.0)
  }

  test("ks_drift statistic is a probability distance") {
    val r = rows("ks_drift").head
    val ks = r.getAs[Double]("ks")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("trimmed_mean trims symmetrically inside the support") {
    val r = rows("trimmed_mean")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      x.getAs[Long]("n_trimmed_each_side") * 20 <= x.getAs[Long]("n")
    })
  }

  test("reciprocal_best pairs are one-to-one") {
    val r = rows("reciprocal_best")
    assert(r.nonEmpty)
    val parts = r.map(_.getAs[Long]("partkey"))
    val supps = r.map(_.getAs[Long]("suppkey"))
    assert(parts.distinct.length == parts.length)
    assert(supps.distinct.length == supps.length)
  }

  test("degree_dist bins cover every node; assortativity in [-1, 1]") {
    val r = rows("degree_dist")
    assert(r.nonEmpty)
    val a = r.head.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
    assert(r.forall(x => x.getAs[Long]("min_deg") <= x.getAs[Long]("max_deg")))
  }

  test("kcore_peel survivors only shrink, parts+suppliers add up") {
    val r = rows("kcore_peel")
    assert(r.length == 4)
    val ns = r.map(_.getAs[Long]("n_nodes"))
    assert(ns.zip(ns.tail).forall { case (a, b) => b <= a })
  }

  test("audience_overlap: intersection bounded by both audiences") {
    val r = rows("audience_overlap")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      val both = x.getAs[Long]("n_both")
      both <= math.min(x.getAs[Long]("n_a"), x.getAs[Long]("n_b")) &&
        x.getAs[Double]("jaccard") <= 1.0
    })
  }

  test("touch_attribution conserves credit across models") {
    val r = rows("touch_attribution")
    assert(r.nonEmpty)
    val ft = r.map(_.getAs[Long]("first_touch")).sum
    val lt = r.map(_.getAs[Long]("last_touch")).sum
    assert(ft == lt) // both count exactly the touched conversions
    val lin = r.map(_.getAs[Double]("linear_credit")).sum
    // micros rounding: each conversion distributes 1 ± n·5e-7
    assert(math.abs(lin - ft) < 0.01 * ft + 1)
  }

  test("seasonal_decompose re-adds exactly: y = trend + seasonal + residual") {
    val r = rows("seasonal_decompose")
    assert(r.nonEmpty)
    r.foreach { x =>
      val y = x.getAs[Long]("y").toDouble
      val sum = x.getAs[Double]("trend") + x.getAs[Double]("seasonal") +
        x.getAs[Double]("residual")
      assert(math.abs(y - sum) < 1e-6, s"additivity broke: $y vs $sum")
    }
  }

  test("activity_streaks lengths match their date spans") {
    val r = rows("activity_streaks")
    assert(r.nonEmpty)
    r.foreach { x =>
      val days = x.getAs[Long]("streak_days")
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        x.getAs[java.sql.Date]("streak_start").toLocalDate,
        x.getAs[java.sql.Date]("streak_end").toLocalDate) + 1
      assert(days == span)
    }
  }

  test("rolling_active_users: dau never exceeds wau") {
    val r = rows("rolling_active_users")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      x.getAs[Long]("dau") <= x.getAs[Long]("wau") &&
        x.getAs[Double]("stickiness") <= 1.0 + 1e-9
    })
  }

  test("order_reconcile categories partition the orders") {
    val r = rows("order_reconcile")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      x.getAs[Long]("n_exact") + x.getAs[Long]("n_rounding") +
        x.getAs[Long]("n_mismatch") == x.getAs[Long]("n_orders")
    })
  }

  test("ship_latency percentiles are ordered") {
    val r = rows("ship_latency")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      x.getAs[Long]("p50_days") <= x.getAs[Long]("p90_days") &&
        x.getAs[Long]("p90_days") <= x.getAs[Long]("p99_days")
    })
  }

  test("forecast_interval coverage is a rate over the held-out days") {
    val r = rows("forecast_interval")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      val c = x.getAs[Double]("coverage")
      c >= 0.0 && c <= 1.0 &&
        x.getAs[Long]("n_covered") <= x.getAs[Long]("n_eval")
    })
  }

  test("pca_power: max-normalized loadings, explained ratio in (0, 1]") {
    val r = rows("pca_power")
    assert(r.length == 8)
    val loadings = r.map(_.getAs[Double]("loading"))
    assert(math.abs(loadings.map(math.abs).max - 1.0) < 1e-9)
    val er = r.head.getAs[Double]("explained_ratio")
    assert(er > 0.0 && er <= 1.0 + 1e-9)
  }

  test("embed_standardize: ordered support, nonnegative spread") {
    val r = rows("embed_standardize")
    assert(r.length == 16)
    assert(r.forall { x =>
      x.getAs[Double]("min_v") <= x.getAs[Double]("mean") + 1e-6 &&
        x.getAs[Double]("mean") <= x.getAs[Double]("max_v") + 1e-6 &&
        x.getAs[Double]("std") >= 0.0
    })
  }

  test("containment_pairs: jaccard never exceeds either containment") {
    val r = rows("containment_pairs")
    r.foreach { x =>
      val j = x.getAs[Double]("jaccard")
      assert(j <= x.getAs[Double]("contain_1") + 1e-9)
      assert(j <= x.getAs[Double]("contain_2") + 1e-9)
      assert(x.getAs[Double]("max_contain") <= 1.0 + 1e-9)
    }
  }

  test("simpson_check signs are signs") {
    val r = rows("simpson_check")
    assert(r.nonEmpty)
    assert(r.forall { x =>
      Set(-1L, 0L, 1L)(x.getAs[Long]("slope_sign")) &&
        Set(-1L, 0L, 1L)(x.getAs[Long]("overall_sign"))
    })
  }

  test("revenue_waterfall is an exact partition of the month delta") {
    val r = rows("revenue_waterfall")
    assert(r.nonEmpty)
    r.foreach { x =>
      val lhs = x.getAs[Double]("revenue")
      val rhs = x.getAs[Double]("prev_revenue") +
        x.getAs[Double]("new_revenue") + x.getAs[Double]("expansion") -
        x.getAs[Double]("contraction") - x.getAs[Double]("churned")
      assert(math.abs(lhs - rhs) < 1e-6, s"bridge broke: $lhs vs $rhs")
    }
  }

  test("ab_srm chi2 is nonnegative; per-scope counts bounded by users") {
    val r = rows("ab_srm")
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Double]("chi2") >= 0.0))
  }

  test("dedup_time_window dup counts bounded by events") {
    val r = rows("dedup_time_window")
    assert(r.nonEmpty)
    assert(r.forall(x => x.getAs[Long]("n_dups") < x.getAs[Long]("n_events")))
  }

  test("mix_variance: price + volume effects bridge the delta") {
    val r = rows("mix_variance")
    assert(r.nonEmpty)
    r.foreach { x =>
      val bridge = x.getAs[Double]("price_effect") +
        x.getAs[Double]("volume_effect")
      // two half-up unit roundings → bridge within 2 rev-units (2e-4 $)
      assert(math.abs(bridge - x.getAs[Double]("delta")) < 3e-4,
        s"bridge ${bridge} vs ${x.getAs[Double]("delta")}")
    }
  }

  test("growth_accounting identities hold exactly") {
    val r = rows("growth_accounting").sortBy(_.getAs[java.sql.Date]("wk").getTime)
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("active_users") ==
        x.getAs[Long]("new_users") + x.getAs[Long]("retained") +
          x.getAs[Long]("resurrected"))
    }
    r.zip(r.tail).foreach { case (p, c) =>
      // churned(w) = active(w−1) − retained(w) when weeks are contiguous
      if (java.time.temporal.ChronoUnit.DAYS.between(
          p.getAs[java.sql.Date]("wk").toLocalDate,
          c.getAs[java.sql.Date]("wk").toLocalDate) == 7)
        assert(c.getAs[Long]("churned") ==
          p.getAs[Long]("active_users") - c.getAs[Long]("retained"))
    }
  }

  test("centroid_distances: full matrix, nonnegative") {
    val r = rows("centroid_distances")
    assert(r.length == 45) // C(10,2)
    assert(r.forall(_.getAs[Double]("centroid_dist") >= 0.0))
  }

  test("hits_scores are max-normalized per role") {
    val r = rows("hits_scores")
    assert(r.length == 20)
    val byRole = r.groupBy(_.getAs[String]("role"))
    assert(byRole.keySet == Set("hub", "authority"))
    byRole.values.foreach { rs =>
      assert(math.abs(rs.map(_.getAs[Double]("score")).max - 1.0) < 1e-9)
      assert(rs.forall(_.getAs[Double]("score") > 0.0))
    }
  }

  test("anomaly_ensemble vote equals its flags") {
    val r = rows("anomaly_ensemble")
    assert(r.nonEmpty)
    r.foreach { x =>
      val n = Seq("flag_z", "flag_mad", "flag_ewma")
        .count(x.getAs[Boolean](_))
      assert(x.getAs[Long]("n_flags") == n)
      assert(x.getAs[Boolean]("is_anomaly") == (n >= 2))
    }
  }

  test("peak_concurrency is at least 1 on active days") {
    val r = rows("peak_concurrency")
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("peak_concurrent") >= 1L))
  }

  test("revenue_drawdown: peak dominates, drawdown nonnegative") {
    val r = rows("revenue_drawdown")
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Double]("running_peak") >= x.getAs[Double]("revenue") - 1e-9)
      assert(x.getAs[Double]("drawdown") >= -1e-9)
    }
  }

  test("embed_outliers distances are nonneg and sorted desc") {
    val r = rows("embed_outliers")
    assert(r.length == 20)
    val d = r.map(_.getAs[Double]("dist_from_centroid"))
    assert(d.forall(_ >= 0.0))
    assert(d.zip(d.tail).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("zipf_fit slope is negative on natural-ish text") {
    val r = rows("zipf_fit").head
    assert(r.getAs[Long]("vocab") > 0)
    assert(r.getAs[Double]("zipf_slope") < 0.0)
  }

  test("weekday_anova F is nonnegative where defined") {
    val r = rows("weekday_anova")
    assert(r.nonEmpty)
    r.foreach { x =>
      val f = x.getAs[Any]("f_stat")
      if (f != null) assert(f.asInstanceOf[Double] >= 0.0)
    }
  }

  test("open_order_aging buckets partition the backlog") {
    val r = rows("open_order_aging")
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("n_0_30d") + x.getAs[Long]("n_31_90d") +
        x.getAs[Long]("n_91_365d") + x.getAs[Long]("n_over_1y") ==
        x.getAs[Long]("n_open"))
    }
  }

  test("bloom_join equals the plain join") {
    import org.apache.spark.sql.functions._
    val bloom = rows("bloom_join")
    val plain = graft.Tables(spark, dir, "orders")
      .join(graft.Tables(spark, dir, "customer")
        .filter(col("c_acctbal") > 9000), col("o_custkey") === col("c_custkey"))
      .join(graft.Tables(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bloom.map(r =>
      r.getAs[String]("nation") -> r.getAs[Long]("n_orders")).toMap == plain)
  }
}
