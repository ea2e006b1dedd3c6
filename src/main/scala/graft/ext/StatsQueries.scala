package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Rank-statistics and cooperative-attribution tier — the remaining
  * classical nonparametric tests beside [[graft.queries.OlapQueries]]'s
  * Mann–Whitney / Wilcoxon / Cramér's V and EventQueries' weekday
  * ANOVA, plus the Shapley-value channel attribution next to the
  * Markov removal-effect form.
  *
  * House determinism discipline throughout (the reference delegates all
  * query arithmetic to PostgreSQL — `ulule/mover` `pkg/mover/extract.go`
  * runs its SQL verbatim — so a standalone engine must pin its own
  * cross-engine numeric contract): every accumulation is an exact
  * INTEGER/DECIMAL(38) sum; where a ratio enters a sum it is carried as
  * a scaled integer division (`div` / DuckDB `//`) whose truncation is
  * part of the operator's defined semantics (the pageRank contrib
  * rule); doubles appear only in final scalar readouts assembled from
  * already-exact aggregates with IDENTICAL expression trees on both
  * engines, rounded at 6dp.
  *
  * Scale discipline: the corpus-side work in every operator here is one
  * aggregation to a VALUE GRID (cents histogram, quantity×discount
  * contingency grid, touch-set bitmask) or per-entity rollup; ordered
  * prefix statistics run on [[DistRank.globalCumSum]]'s two-phase
  * range-partitioned sweep — no corpus-proportional single-task sort
  * anywhere (PlanAuditSpec's registry-wide window audit enforces this).
  */
object StatsQueries {

  private def dec(c: Column) = c.cast("decimal(18,4)")

  // ---------------------------------------------------------------- //
  // KENDALL'S τ-b                                                     //
  // ---------------------------------------------------------------- //

  /** KENDALL'S τ-b between lineitem quantity and discount — the
    * concordance-based rank correlation whose classic definition is an
    * all-pairs O(n²) sweep; here computed EXACTLY from the bounded
    * quantity × discount-cents contingency grid: concordant pairs are
    * Σ over ordered grid-cell pairs (qa<qb, da<db) of nₐ·n_b, so the
    * n² pair space collapses to a ≤(50·11)² literal-bounded grid join
    * regardless of corpus size. Tie terms come off the grid margins
    * (Σt(t−1) per distinct value), τ-b =
    * 2(C−D)/√((n(n−1)−Tx)(n(n−1)−Ty)). C and D are corpus-quadratic
    * counts (n²-scale), so they are surfaced as exact ppm shares of
    * the n(n−1) ordered-pair space (BIGINT-safe at any corpus), with
    * the τ itself the only double, rounded.
    *
    * Scale: ONE corpus aggregation to the grid; the grid self-join is
    * broadcast (≤550 rows a side); margins/totals are grid rollups.
    */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("q"),
        floor(dec(col("l_discount")) * 100).cast("long").as("d"))
      .groupBy("q", "d")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cells.count()
    val a = cells.select(col("q").as("qa"), col("d").as("da"),
      col("n").as("na"))
    val b = cells.select(col("q").as("qb"), col("d").as("db"),
      col("n").as("nb"))
    val pairs = a.join(broadcast(b), col("qa") < col("qb"))
      .agg(
        sum(expr("CASE WHEN da < db THEN na * nb ELSE 0 END")).as("c"),
        sum(expr("CASE WHEN da > db THEN na * nb ELSE 0 END")).as("dd"))
    val tx = cells.groupBy("q").agg(sum("n").as("t"))
      .agg(sum(expr("t * (t - 1)")).as("tx2"))
    val ty = cells.groupBy("d").agg(sum("n").as("t"))
      .agg(sum(expr("t * (t - 1)")).as("ty2"))
    val tot = cells.agg(sum("n").as("nn"))
    pairs.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(tot))
      .select(
        col("nn").cast("long").as("n"),
        // exact ppm of the n(n−1) ordered-pair space (2C of it is
        // concordant: each unordered pair appears once in C); the
        // greatest() keeps a 0/1-row corpus at share 0 instead of a
        // division by zero — Spark's div would NULL quietly but
        // DuckDB's // ERRORS, a cross-engine divergence
        (expr("2 * c * 1000000 div greatest(nn * (nn - 1), 1)") / 1e6)
          .as("concordant_share"),
        (expr("2 * dd * 1000000 div greatest(nn * (nn - 1), 1)") / 1e6)
          .as("discordant_share"),
        expr("""CASE WHEN nn > 1
                  AND nn * (nn - 1) - tx2 > 0
                  AND nn * (nn - 1) - ty2 > 0 THEN
                ROUND(2 * (CAST(c AS DOUBLE) - CAST(dd AS DOUBLE))
                  / SQRT(CAST(nn * (nn - 1) - tx2 AS DOUBLE)
                       * CAST(nn * (nn - 1) - ty2 AS DOUBLE)), 6)
                END""").as("tau_b"))
  }

  val kendallTauSql: String =
    """WITH cells AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS q,
      |    CAST(FLOOR(CAST(l_discount AS DECIMAL(18,4)) * 100) AS BIGINT)
      |      AS d,
      |    CAST(COUNT(*) AS HUGEINT) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |pairs AS (
      |  SELECT
      |    SUM(CASE WHEN a.d < b.d THEN a.n * b.n ELSE 0 END) AS c,
      |    SUM(CASE WHEN a.d > b.d THEN a.n * b.n ELSE 0 END) AS dd
      |  FROM cells a JOIN cells b ON a.q < b.q),
      |tx AS (SELECT SUM(t * (t - 1)) AS tx2 FROM
      |  (SELECT SUM(n) AS t FROM cells GROUP BY q)),
      |ty AS (SELECT SUM(t * (t - 1)) AS ty2 FROM
      |  (SELECT SUM(n) AS t FROM cells GROUP BY d)),
      |tot AS (SELECT SUM(n) AS nn FROM cells)
      |SELECT CAST(nn AS BIGINT) AS n,
      |  (2 * c * 1000000 // GREATEST(nn * (nn - 1), 1)) / 1e6
      |    AS concordant_share,
      |  (2 * dd * 1000000 // GREATEST(nn * (nn - 1), 1)) / 1e6
      |    AS discordant_share,
      |  CASE WHEN nn > 1
      |    AND nn * (nn - 1) - tx2 > 0
      |    AND nn * (nn - 1) - ty2 > 0 THEN
      |  ROUND(2 * (CAST(c AS DOUBLE) - CAST(dd AS DOUBLE))
      |    / SQRT(CAST(nn * (nn - 1) - tx2 AS DOUBLE)
      |         * CAST(nn * (nn - 1) - ty2 AS DOUBLE)), 6)
      |  END AS tau_b
      |FROM pairs CROSS JOIN tx CROSS JOIN ty CROSS JOIN tot""".stripMargin

  // ---------------------------------------------------------------- //
  // SPEARMAN'S ρ                                                      //
  // ---------------------------------------------------------------- //

  /** SPEARMAN'S ρ between a customer's order count and total spend —
    * Pearson over tie-averaged ranks, WITHOUT materializing a rank per
    * row through a global sort: each dimension aggregates to its value
    * grid, [[DistRank.globalCumSum]] supplies the exact prefix count,
    * and the tie-averaged rank of value v is (cum_before + (t+1)/2).
    * Carried CENTERED and DOUBLED to stay integral: c2(v) =
    * 2·avgrank − (n+1)·… ≡ 2·cum − t − tot, so Σc2 = 0 exactly and
    * ρ = Σc2x·c2y / √(Σc2x²·Σc2y²) needs no further centering. All
    * moments are exact DECIMAL(38) sums (|c2| ≤ n keeps Σc2² ≤ n³ —
    * exact inside 38 digits to n ≈ 10¹²; widen the cast at a larger
    * survey, a scale-constant change, not a shape change); the ρ
    * readout is the only double, rounded, with a zero-variance guard
    * identical in both engines.
    *
    * Scale: one corpus aggregation per customer, two grid sweeps on
    * the two-phase range partitioner, two co-partitioned joins back
    * on the value keys (the spend grid is corpus-sized — never
    * broadcast), one moments aggregation.
    */
  def spearmanCorr(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"),
        floor(sum(dec(col("o_totalprice"))) * 100).cast("decimal(38,0)")
          .as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    cust.count()
    def centered(df: DataFrame, v: String, out: String): DataFrame =
      DistRank.globalCumSum(
        df.groupBy(v).agg(count(lit(1)).cast("decimal(38,0)").as("t")),
        "t", "cum", "tot", Seq(col(v)))
        .select(col(v), expr("2 * cum - t - tot").as(out))
    val rx = centered(cust.select("x"), "x", "c2x")
    val ry = centered(cust.select("y"), "y", "c2y")
    cust.join(rx, Seq("x")).join(ry, Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(expr("c2x * c2y")).as("sxy"),
        sum(expr("c2x * c2x")).as("sxx"),
        sum(expr("c2y * c2y")).as("syy"))
      .select(col("n").cast("long").as("n"),
        expr("""CASE WHEN sxx > 0 AND syy > 0 THEN
                ROUND(CAST(sxy AS DOUBLE)
                  / SQRT(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 6)
                END""").as("spearman_rho"))
  }

  val spearmanCorrSql: String =
    """WITH cust AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS HUGEINT) AS x,
      |    CAST(FLOOR(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100)
      |      AS HUGEINT) AS y
      |  FROM orders GROUP BY 1),
      |gx AS (SELECT x, CAST(COUNT(*) AS HUGEINT) AS t FROM cust GROUP BY 1),
      |rx AS (
      |  SELECT x, 2 * SUM(t) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    - t - SUM(t) OVER () AS c2x
      |  FROM gx),
      |gy AS (SELECT y, CAST(COUNT(*) AS HUGEINT) AS t FROM cust GROUP BY 1),
      |ry AS (
      |  SELECT y, 2 * SUM(t) OVER (ORDER BY y
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    - t - SUM(t) OVER () AS c2y
      |  FROM gy),
      |j AS (
      |  SELECT c2x, c2y
      |  FROM cust JOIN rx USING (x) JOIN ry USING (y)),
      |m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM(c2x * c2y) AS sxy, SUM(c2x * c2x) AS sxx,
      |    SUM(c2y * c2y) AS syy
      |  FROM j)
      |SELECT n,
      |  CASE WHEN sxx > 0 AND syy > 0 THEN
      |    ROUND(CAST(sxy AS DOUBLE)
      |      / SQRT(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 6)
      |  END AS spearman_rho
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- //
  // KRUSKAL–WALLIS H                                                  //
  // ---------------------------------------------------------------- //

  /** KRUSKAL–WALLIS H — does order value distribute identically across
    * the five order priorities? The k-group generalization of
    * [[graft.queries.OlapQueries]]'s Mann–Whitney, on the same
    * no-materialized-ranks construction: the corpus aggregates to the
    * (value-cents × priority) cell grid, the POOLED per-value counts
    * get an exact prefix sum on [[DistRank.globalCumSum]], and the
    * tie-averaged rank of value v doubled — ar2(v) = 2·cum − t + 1 —
    * stays integral. Per-group rank sums 2R_g = Σ n_gv·ar2(v) are
    * exact DECIMAL(38); Σ R_g²/n_g is carried as Σ((2R_g)² div n_g)
    * with the defined-truncation rule (exact inside 38 digits while
    * (2R_g)² ≤ 4N⁴ holds, N ≈ 10⁹ — widen the scale constant at a
    * larger survey), and H with its tie correction
    * (1 − Σ(t³−t)/(N³−N)) is assembled from those exact integers in
    * doubles, rounded. Output is one row per group (deterministic by
    * priority) carrying the group mean rank beside the shared H/dof.
    */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    // no outer persist: the cells aggregate is one cheap orders scan
    // (recomputed once for the group join), and the pooled sweep's
    // heavy range exchange is already persisted INSIDE globalCumSum —
    // an extra persist+count here just adds two scheduling barriers
    // (measured 3.1 s → the mannwhitney-class ~1 s without them)
    val vals = Tables(spark, dir, "orders")
      .select(floor(dec(col("o_totalprice")) * 100).cast("long").as("v"),
        col("o_orderpriority").as("g"))
    val cells = vals.groupBy("v", "g")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
    val pool = DistRank.globalCumSum(
      vals.groupBy("v").agg(count(lit(1)).cast("decimal(38,0)").as("t")),
      "t", "cum", "tot", Seq(col("v")))
      .withColumn("ar2", expr("2 * cum - t + 1"))
    val ties = pool.agg(sum(expr("t * t * t - t")).as("tie3"))
    val grp = cells.join(pool.select("v", "ar2"), Seq("v"))
      .groupBy("g")
      .agg(sum("n").as("ng"), sum(expr("n * ar2")).as("r2g"))
    val tot = grp.agg(sum("ng").as("nn"), count(lit(1)).as("k"),
      // Σ (2R_g)² div n_g — the ANOVA sb_micros rule: each term's
      // truncation is defined identically in both engines
      sum(expr("r2g * r2g div ng")).as("a4"))
    grp.crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
      .select(col("g").as("o_orderpriority"),
        col("ng").cast("long").as("n_group"),
        // exact micros mean rank: (2R_g)·10⁶ div (2n_g), read as double
        (expr("r2g * 1000000 div (2 * ng)") / 1e6).as("mean_rank"),
        // H = 3·Σ(2R_g)²/n_g / (N(N+1)) − 3(N+1), tie-corrected by
        // (N³−N)/(N³−N−Σ(t³−t)); exact-integer core, double readout
        expr("""CASE WHEN nn > 1 AND nn * nn * nn - nn - tie3 > 0 THEN
                ROUND((3 * CAST(a4 AS DOUBLE)
                        / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))
                      - 3 * CAST(nn + 1 AS DOUBLE))
                  * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                      * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))
                  / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
                      * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)
                      - CAST(tie3 AS DOUBLE)), 6)
                END""").as("h"),
        (col("k") - 1).cast("long").as("dof"))
      .orderBy("o_orderpriority")
  }

  val kruskalWallisSql: String =
    """WITH cells AS (
      |  SELECT CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,4)) * 100)
      |      AS BIGINT) AS v,
      |    o_orderpriority AS g, CAST(COUNT(*) AS HUGEINT) AS n
      |  FROM orders GROUP BY 1, 2),
      |pool AS (
      |  SELECT v, t,
      |    2 * SUM(t) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t + 1
      |      AS ar2
      |  FROM (SELECT v, SUM(n) AS t FROM cells GROUP BY v)),
      |ties AS (SELECT SUM(t * t * t - t) AS tie3 FROM pool),
      |grp AS (
      |  SELECT g, SUM(n) AS ng, SUM(n * ar2) AS r2g
      |  FROM cells JOIN pool USING (v)
      |  GROUP BY g),
      |tot AS (
      |  SELECT SUM(ng) AS nn, CAST(COUNT(*) AS BIGINT) AS k,
      |    SUM(r2g * r2g // ng) AS a4
      |  FROM grp)
      |SELECT g AS o_orderpriority, CAST(ng AS BIGINT) AS n_group,
      |  (r2g * 1000000 // (2 * ng)) / 1e6 AS mean_rank,
      |  CASE WHEN nn > 1 AND nn * nn * nn - nn - tie3 > 0 THEN
      |  ROUND((3 * CAST(a4 AS DOUBLE)
      |          / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))
      |        - 3 * CAST(nn + 1 AS DOUBLE))
      |    * (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
      |        * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE))
      |    / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)
      |        * CAST(nn AS DOUBLE) - CAST(nn AS DOUBLE)
      |        - CAST(tie3 AS DOUBLE)), 6)
      |  END AS h,
      |  k - 1 AS dof
      |FROM grp CROSS JOIN tot CROSS JOIN ties
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- //
  // LOG-RANK TEST                                                     //
  // ---------------------------------------------------------------- //

  /** LOG-RANK TEST — does the reorder-gap survival curve differ between
    * BUILDING-segment customers and the rest? The two-cohort
    * inferential sibling of [[graft.queries.OlapQueries]]'s
    * Kaplan–Meier estimator, on the SAME duration model (gap to next
    * order = event; gap from a customer's last order to the dataset
    * horizon = right-censored) with the cohort label joined from the
    * customer dimension. The risk table is keyed by distinct gap-days
    * — calendar-bounded at any corpus size — so the at-risk suffix
    * sums are bounded windows (the survival_km adjudication class).
    * Per event time: E₁ micros = d·n₁·10⁶ div n and the hypergeometric
    * variance micros = d·p₁·(10⁶−p₁)·(n−d) div (10⁶·(n−1)) with
    * p₁ = n₁·10⁶ div n — every truncation defined identically in both
    * engines (exact inside DECIMAL(38) to N ≈ 10¹²); the χ² readout
    * (O₁−E₁)²/V is the only double, rounded, with the standard
    * 3.841 (α=0.05, df=1) threshold decided on the shared value.
    */
  def logrankTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val seg = Tables(spark, dir, "customer")
      .select(col("c_custkey"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("g1"))
    val orders = Tables(spark, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_orderkey"))
    val dmax = orders.agg(max(col("od")).as("dmax"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("od"), col("o_orderkey"))
    val durs = orders
      .withColumn("nxt", lead(col("od"), 1).over(w))
      .crossJoin(broadcast(dmax))
      .join(seg, col("o_custkey") === col("c_custkey"))
      .select(
        when(col("nxt").isNotNull, datediff(col("nxt"), col("od")))
          .otherwise(datediff(col("dmax"), col("od"))).cast("long").as("t"),
        col("nxt").isNotNull.cast("long").as("evt"), col("g1"))
    val hist = durs.groupBy("t")
      .agg(sum("evt").cast("decimal(38,0)").as("d"),
        sum(expr("evt * g1")).cast("decimal(38,0)").as("d1"),
        count(lit(1)).cast("decimal(38,0)").as("nall"),
        sum("g1").cast("decimal(38,0)").as("nall1"))
    val atRisk = Window.orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    hist
      .withColumn("n", sum("nall").over(atRisk))
      .withColumn("n1", sum("nall1").over(atRisk))
      .filter(col("d") > 0)
      .withColumn("p1", expr("n1 * 1000000 div n"))
      .withColumn("e1u", expr("d * n1 * 1000000 div n"))
      .withColumn("vu", expr(
        """CASE WHEN n > 1 THEN
             d * p1 * (1000000 - p1) * (n - d) div (1000000 * (n - 1))
           ELSE 0 END"""))
      .agg(sum("d1").as("o1"), sum("d").as("dtot"),
        sum("e1u").as("e1u"), sum("vu").as("vu"),
        max("n1").as("n1max"), max(expr("n - n1")).as("n2max"))
      .select(
        col("n1max").cast("long").as("n_building"),
        col("n2max").cast("long").as("n_rest"),
        col("o1").cast("long").as("observed_events"),
        (col("e1u") / 1e6).as("expected_events"),
        expr("""CASE WHEN vu > 0 THEN
                ROUND((CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6)
                    * (CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6)
                  / (CAST(vu AS DOUBLE) / 1e6), 6)
                END""").as("chi2"),
        expr("""CASE WHEN vu > 0 THEN
                (CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6)
                  * (CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6)
                  / (CAST(vu AS DOUBLE) / 1e6) > 3.841459
                END""").as("differs_05"))
  }

  val logrankTestSql: String =
    """WITH seg AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g1
      |  FROM customer),
      |o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_orderkey
      |  FROM orders),
      |durs AS (
      |  SELECT
      |    CAST(COALESCE(
      |      date_diff('day', od, LEAD(od) OVER (PARTITION BY o_custkey
      |        ORDER BY od, o_orderkey)),
      |      date_diff('day', od, (SELECT MAX(od) FROM o))) AS BIGINT)
      |      AS t,
      |    CASE WHEN LEAD(od) OVER (PARTITION BY o_custkey
      |      ORDER BY od, o_orderkey) IS NULL THEN 0 ELSE 1 END AS evt,
      |    g1
      |  FROM o JOIN seg ON c_custkey = o_custkey),
      |hist AS (
      |  SELECT t, CAST(SUM(evt) AS HUGEINT) AS d,
      |    CAST(SUM(evt * g1) AS HUGEINT) AS d1,
      |    CAST(COUNT(*) AS HUGEINT) AS nall,
      |    CAST(SUM(g1) AS HUGEINT) AS nall1
      |  FROM durs GROUP BY t),
      |risk AS (
      |  SELECT t, d, d1,
      |    SUM(nall) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n,
      |    SUM(nall1) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n1
      |  FROM hist),
      |terms AS (
      |  SELECT d, d1, n, n1,
      |    n1 * 1000000 // n AS p1,
      |    d * n1 * 1000000 // n AS e1u,
      |    CASE WHEN n > 1 THEN
      |      d * (n1 * 1000000 // n) * (1000000 - n1 * 1000000 // n)
      |        * (n - d) // (1000000 * (n - 1))
      |    ELSE 0 END AS vu
      |  FROM risk WHERE d > 0),
      |agg AS (
      |  SELECT SUM(d1) AS o1, SUM(e1u) AS e1u, SUM(vu) AS vu,
      |    MAX(n1) AS n1max, MAX(n - n1) AS n2max
      |  FROM terms)
      |SELECT CAST(n1max AS BIGINT) AS n_building,
      |  CAST(n2max AS BIGINT) AS n_rest,
      |  CAST(o1 AS BIGINT) AS observed_events,
      |  CAST(e1u AS BIGINT) / 1e6 AS expected_events,
      |  CASE WHEN vu > 0 THEN
      |    ROUND((CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6)
      |        * (CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6)
      |      / (CAST(vu AS DOUBLE) / 1e6), 6)
      |  END AS chi2,
      |  CASE WHEN vu > 0 THEN
      |    (CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6)
      |      * (CAST(o1 AS DOUBLE) - CAST(e1u AS DOUBLE) / 1e6)
      |      / (CAST(vu AS DOUBLE) / 1e6) > 3.841459
      |  END AS differs_05
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------- //
  // SHAPLEY-VALUE ATTRIBUTION                                         //
  // ---------------------------------------------------------------- //

  /** SHAPLEY-VALUE channel attribution — the cooperative-game credit
    * split beside [[graft.ext.EventQueries]]'s Markov removal effect
    * and position-based [[graft.ext.EventQueries]] touch attribution:
    * each purchase's 7-day touch window (same journey definition as
    * touch_attribution) collapses to the SET of channels it contains,
    * v(S) counts journeys reachable with only channels in S
    * (touch-set ⊆ S), and channel c's Shapley value is
    * Σ_{S∌c} |S|!(k−|S|−1)!/k! · (v(S∪c) − v(S)). With k=3 channels
    * the coalition lattice is 8 literal rows and the factorial weights
    * scaled by 3!=6 are the integers {2,1,1,2} — so φ·6 is EXACT and
    * the corpus never sees the lattice: one aggregation to ≤7
    * touch-set bitmask counts, then bounded bitwise subset joins.
    * Efficiency axiom (Σφ = v(full) = all attributed journeys) makes
    * the readout self-checking; share_ppm is the exact div readout.
    */
  def attributionShapley(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    val touches = ev
      .filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("ts").as("t_ts"),
        col("event_type").as("touch_type"))
    val masks = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") < col("p_ts") &&
        col("t_ts") >= expr("p_ts - INTERVAL 7 DAY"))
      .groupBy("p_id")
      .agg((max(when(col("touch_type") === "view", 1L).otherwise(0L))
        + max(when(col("touch_type") === "click", 2L).otherwise(0L))
        + max(when(col("touch_type") === "signup", 4L).otherwise(0L)))
        .as("m"))
      .groupBy("m").agg(count(lit(1)).as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    masks.count()
    // v(S) over the 8-coalition lattice: journeys whose touch set ⊆ S
    val coal = spark.range(8).select(col("id").cast("long").as("s"))
    val v = coal.join(broadcast(masks), expr("(s & m) = m"), "left")
      .groupBy("s").agg(coalesce(sum("cnt"), lit(0L)).as("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    v.count()
    val channels = coal.filter(col("s").isin(1L, 2L, 4L))
      .select(col("s").as("bit"),
        when(col("s") === 1L, "view").when(col("s") === 2L, "click")
          .otherwise("signup").as("channel"))
    // Σ over S ∌ c of w(|S|)·(v(S∪c) − v(S)), w·3! ∈ {2,1,1,2}
    channels
      .join(broadcast(v.select(col("s"), col("v").as("v_s"))),
        expr("(s & bit) = 0"))
      .join(broadcast(v.select(col("s").as("su"), col("v").as("v_su"))),
        expr("su = s | bit"))
      .withColumn("w6", expr(
        """CASE (s & 1) + ((s >> 1) & 1) + ((s >> 2) & 1)
             WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END"""))
      .groupBy("channel")
      .agg(sum(expr("w6 * (v_su - v_s)")).as("phi6"))
      .crossJoin(broadcast(v.filter(col("s") === 7L)
        .select(col("v").as("total"))))
      .select(col("channel"),
        col("total").as("n_journeys"),
        col("phi6").as("phi_sixths"),
        round(col("phi6") / 6.0, 6).as("phi"),
        // greatest(): an eventless corpus has total = 0 — DuckDB's //
        // errors on zero where Spark's div NULLs; share 0 is the
        // defined degenerate readout
        (expr("phi6 * 1000000 div greatest(6 * total, 1)") / 1e6)
          .as("share"))
      .orderBy("channel")
  }

  val attributionShapleySql: String =
    """WITH purchases AS (
      |  SELECT user_id, event_id AS p_id, ts AS p_ts
      |  FROM events WHERE event_type = 'purchase'),
      |touches AS (
      |  SELECT user_id, ts AS t_ts, event_type AS touch_type
      |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
      |masks AS (
      |  SELECT m, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      |    SELECT p.p_id,
      |      MAX(CASE WHEN t.touch_type = 'view' THEN 1 ELSE 0 END)
      |      + MAX(CASE WHEN t.touch_type = 'click' THEN 2 ELSE 0 END)
      |      + MAX(CASE WHEN t.touch_type = 'signup' THEN 4 ELSE 0 END)
      |        AS m
      |    FROM purchases p JOIN touches t USING (user_id)
      |    WHERE t.t_ts < p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
      |    GROUP BY p.p_id)
      |  GROUP BY m),
      |coal AS (SELECT CAST(range AS BIGINT) AS s FROM range(0, 8)),
      |v AS (
      |  SELECT s, CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS v
      |  FROM coal LEFT JOIN masks ON (s & m) = m
      |  GROUP BY s),
      |channels AS (
      |  SELECT s AS bit,
      |    CASE s WHEN 1 THEN 'view' WHEN 2 THEN 'click'
      |      ELSE 'signup' END AS channel
      |  FROM coal WHERE s IN (1, 2, 4)),
      |phi AS (
      |  SELECT c.channel,
      |    SUM((CASE (vs.s & 1) + ((vs.s >> 1) & 1) + ((vs.s >> 2) & 1)
      |           WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 2 END)
      |        * (vu.v - vs.v)) AS phi6
      |  FROM channels c
      |  JOIN v vs ON (vs.s & c.bit) = 0
      |  JOIN v vu ON vu.s = (vs.s | c.bit)
      |  GROUP BY c.channel)
      |SELECT channel,
      |  (SELECT v FROM v WHERE s = 7) AS n_journeys,
      |  CAST(phi6 AS BIGINT) AS phi_sixths,
      |  ROUND(phi6 / 6.0, 6) AS phi,
      |  (phi6 * 1000000
      |    // GREATEST(6 * (SELECT v FROM v WHERE s = 7), 1)) / 1e6
      |    AS share
      |FROM phi
      |ORDER BY channel""".stripMargin

  /** DIFFERENCE-IN-DIFFERENCES — the quasi-experimental effect
    * estimate beside [[attributionShapley]]'s observational credit
    * split: treatment cohort = nation-0 customers, intervention date
    * 1998-06-01, outcome = mean order value. DiD = (ȳ_T,post −
    * ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre), the parallel-trends estimate of
    * the treatment effect. Exact throughout: the corpus aggregates to
    * the 2×2 (treated × post) cell grid of counts and cent sums; each
    * cell mean is cents·10⁴ div n micros (defined truncation), the DiD
    * is integer subtraction of those micros.
    *
    * Scale: one co-partitioned orders↔customer join, one aggregation
    * to 4 cells; everything after is literal-bounded.
    */
  def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables(spark, dir, "orders")
      .join(Tables(spark, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .select((col("c_nationkey") === 0).as("treated"),
        (to_date(col("o_orderdate")) >= lit("1998-06-01")).as("post"),
        floor(dec(col("o_totalprice")) * 100).cast("decimal(38,0)")
          .as("cents"))
      .groupBy("treated", "post")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("cents").as("s"))
      .withColumn("m", expr("s * 10000 div n"))
    cells.agg(
      sum(expr("CASE WHEN treated AND post THEN n ELSE 0 END"))
        .cast("long").as("n_treat_post"),
      sum(expr("CASE WHEN treated AND NOT post THEN n ELSE 0 END"))
        .cast("long").as("n_treat_pre"),
      sum(expr("CASE WHEN NOT treated AND post THEN n ELSE 0 END"))
        .cast("long").as("n_ctrl_post"),
      sum(expr("CASE WHEN NOT treated AND NOT post THEN n ELSE 0 END"))
        .cast("long").as("n_ctrl_pre"),
      sum(expr("CASE WHEN treated AND post THEN m ELSE 0 END")).as("mtp"),
      sum(expr("CASE WHEN treated AND NOT post THEN m ELSE 0 END"))
        .as("mtq"),
      sum(expr("CASE WHEN NOT treated AND post THEN m ELSE 0 END"))
        .as("mcp"),
      sum(expr("CASE WHEN NOT treated AND NOT post THEN m ELSE 0 END"))
        .as("mcq"))
      .select(col("n_treat_pre"), col("n_treat_post"),
        col("n_ctrl_pre"), col("n_ctrl_post"),
        (col("mtq") / 1e6).as("mean_treat_pre"),
        (col("mtp") / 1e6).as("mean_treat_post"),
        (col("mcq") / 1e6).as("mean_ctrl_pre"),
        (col("mcp") / 1e6).as("mean_ctrl_post"),
        (expr("(mtp - mtq) - (mcp - mcq)") / 1e6).as("did"))
  }

  val diffInDiffSql: String =
    """WITH cells AS (
      |  SELECT c.c_nationkey = 0 AS treated,
      |    CAST(o.o_orderdate AS DATE) >= DATE '1998-06-01' AS post,
      |    CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,4)) * 100)
      |      AS HUGEINT)) AS s
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |m AS (SELECT treated, post, n, s * 10000 // n AS m FROM cells),
      |agg AS (
      |  SELECT
      |    SUM(CASE WHEN treated AND post THEN n ELSE 0 END) AS n_treat_post,
      |    SUM(CASE WHEN treated AND NOT post THEN n ELSE 0 END) AS n_treat_pre,
      |    SUM(CASE WHEN NOT treated AND post THEN n ELSE 0 END) AS n_ctrl_post,
      |    SUM(CASE WHEN NOT treated AND NOT post THEN n ELSE 0 END) AS n_ctrl_pre,
      |    SUM(CASE WHEN treated AND post THEN m ELSE 0 END) AS mtp,
      |    SUM(CASE WHEN treated AND NOT post THEN m ELSE 0 END) AS mtq,
      |    SUM(CASE WHEN NOT treated AND post THEN m ELSE 0 END) AS mcp,
      |    SUM(CASE WHEN NOT treated AND NOT post THEN m ELSE 0 END) AS mcq
      |  FROM m)
      |SELECT CAST(n_treat_pre AS BIGINT) AS n_treat_pre,
      |  CAST(n_treat_post AS BIGINT) AS n_treat_post,
      |  CAST(n_ctrl_pre AS BIGINT) AS n_ctrl_pre,
      |  CAST(n_ctrl_post AS BIGINT) AS n_ctrl_post,
      |  mtq / 1e6 AS mean_treat_pre,
      |  mtp / 1e6 AS mean_treat_post,
      |  mcq / 1e6 AS mean_ctrl_pre,
      |  mcp / 1e6 AS mean_ctrl_post,
      |  ((mtp - mtq) - (mcp - mcq)) / 1e6 AS did
      |FROM agg""".stripMargin

  /** GRANGER CAUSALITY (lag-1) — do yesterday's VIEWS help predict
    * today's PURCHASES beyond what yesterday's purchases already say?
    * The inferential completion of [[graft.ext.EventQueries]]'s
    * events_xcorr (which reports the lagged correlation but not whether
    * it adds predictive power): F-test of y_t ~ y_{t−1} against
    * y_t ~ y_{t−1} + x_{t−1} over the gap-filled daily calendar.
    * Closed-form OLS via centered cross-moments — C11 = n·S11 − S1²
    * etc. — which are EXACT DECIMAL(38) integer aggregates of daily
    * counts; n·RSS_r = Cyy − Cy1²/C11 and the 2-regressor
    * n·RSS_u = Cyy − (Cy1²C22 + Cy2²C11 − 2·Cy1Cy2C12)/(C11C22 − C12²)
    * are assembled in doubles from those exact integers with identical
    * expression trees (the n·RSS scaling cancels in F), rounded at 6dp.
    * significant_05 uses the F(1,∞) = χ²(1) critical value 3.841459
    * (exact for the day counts any production span yields).
    *
    * Scale: one corpus aggregation to the daily grid; the calendar
    * completion and the lag are a bounded sequence explode + a
    * shifted-date self-join (no window, no sort); moments are one
    * aggregation over calendar-bounded rows.
    */
  def grangerDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "events")
      .select(to_date(col("ts")).as("d"), col("event_type"))
      .groupBy("d")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
    val span = daily.agg(min("d").as("d0"), max("d").as("d1"))
    val grid = span
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      .join(daily, Seq("d"), "left")
      .select(col("d"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    grid.count()
    val m = grid.select(col("d"), col("y"))
      .join(grid.select(date_add(col("d"), 1).as("d"),
        col("y").as("y1"), col("x").as("x1")), Seq("d"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("y").cast("decimal(38,0)").as("sy"),
        sum("y1").cast("decimal(38,0)").as("s1"),
        sum("x1").cast("decimal(38,0)").as("s2"),
        sum(expr("y * y")).cast("decimal(38,0)").as("syy"),
        sum(expr("y1 * y1")).cast("decimal(38,0)").as("s11"),
        sum(expr("x1 * x1")).cast("decimal(38,0)").as("s22"),
        sum(expr("y * y1")).cast("decimal(38,0)").as("sy1"),
        sum(expr("y * x1")).cast("decimal(38,0)").as("sy2"),
        sum(expr("y1 * x1")).cast("decimal(38,0)").as("s12"))
      .select(col("n"),
        expr("n * syy - sy * sy").as("cyy"),
        expr("n * s11 - s1 * s1").as("c11"),
        expr("n * s22 - s2 * s2").as("c22"),
        expr("n * sy1 - sy * s1").as("cy1"),
        expr("n * sy2 - sy * s2").as("cy2"),
        expr("n * s12 - s1 * s2").as("c12"))
    m.select(col("n").cast("long").as("n_days"),
      expr("""CASE WHEN CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
                - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE) > 0
              THEN ROUND((CAST(cy1 AS DOUBLE) * CAST(c22 AS DOUBLE)
                - CAST(cy2 AS DOUBLE) * CAST(c12 AS DOUBLE))
                / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
                - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)), 6)
              END""").as("coef_y_lag"),
      expr("""CASE WHEN CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
                - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE) > 0
              THEN ROUND((CAST(cy2 AS DOUBLE) * CAST(c11 AS DOUBLE)
                - CAST(cy1 AS DOUBLE) * CAST(c12 AS DOUBLE))
                / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
                - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)), 6)
              END""").as("coef_x_lag"),
      expr("""CASE WHEN c11 > 0 AND n > 3
                AND CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
                  - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE) > 0
                AND CAST(cyy AS DOUBLE)
                  - (CAST(cy1 AS DOUBLE) * CAST(cy1 AS DOUBLE)
                      * CAST(c22 AS DOUBLE)
                    + CAST(cy2 AS DOUBLE) * CAST(cy2 AS DOUBLE)
                      * CAST(c11 AS DOUBLE)
                    - 2 * CAST(cy1 AS DOUBLE) * CAST(cy2 AS DOUBLE)
                      * CAST(c12 AS DOUBLE))
                    / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
                      - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)) > 0
              THEN ROUND(
                ((CAST(cyy AS DOUBLE)
                    - CAST(cy1 AS DOUBLE) * CAST(cy1 AS DOUBLE)
                      / CAST(c11 AS DOUBLE))
                 - (CAST(cyy AS DOUBLE)
                    - (CAST(cy1 AS DOUBLE) * CAST(cy1 AS DOUBLE)
                        * CAST(c22 AS DOUBLE)
                      + CAST(cy2 AS DOUBLE) * CAST(cy2 AS DOUBLE)
                        * CAST(c11 AS DOUBLE)
                      - 2 * CAST(cy1 AS DOUBLE) * CAST(cy2 AS DOUBLE)
                        * CAST(c12 AS DOUBLE))
                      / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
                        - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE))))
                * (CAST(n AS DOUBLE) - 3)
                / (CAST(cyy AS DOUBLE)
                    - (CAST(cy1 AS DOUBLE) * CAST(cy1 AS DOUBLE)
                        * CAST(c22 AS DOUBLE)
                      + CAST(cy2 AS DOUBLE) * CAST(cy2 AS DOUBLE)
                        * CAST(c11 AS DOUBLE)
                      - 2 * CAST(cy1 AS DOUBLE) * CAST(cy2 AS DOUBLE)
                        * CAST(c12 AS DOUBLE))
                      / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
                        - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE))), 6)
              END""").as("f_stat"))
      .withColumn("granger_05",
        expr("CASE WHEN f_stat IS NOT NULL THEN f_stat > 3.841459 END"))
  }

  val grangerDailySql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM daily),
      |cal AS (
      |  SELECT CAST(gs.d AS DATE) AS d FROM span,
      |  LATERAL (SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |                    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS d) gs),
      |grid AS (
      |  SELECT c.d, COALESCE(daily.x, 0) AS x, COALESCE(daily.y, 0) AS y
      |  FROM cal c LEFT JOIN daily USING (d)),
      |pairs AS (
      |  SELECT g.y, h.y AS y1, h.x AS x1
      |  FROM grid g JOIN grid h ON g.d = h.d + 1),
      |s AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
      |    CAST(SUM(y) AS HUGEINT) AS sy, CAST(SUM(y1) AS HUGEINT) AS s1,
      |    CAST(SUM(x1) AS HUGEINT) AS s2,
      |    CAST(SUM(y * y) AS HUGEINT) AS syy,
      |    CAST(SUM(y1 * y1) AS HUGEINT) AS s11,
      |    CAST(SUM(x1 * x1) AS HUGEINT) AS s22,
      |    CAST(SUM(y * y1) AS HUGEINT) AS sy1,
      |    CAST(SUM(y * x1) AS HUGEINT) AS sy2,
      |    CAST(SUM(y1 * x1) AS HUGEINT) AS s12
      |  FROM pairs),
      |c AS (
      |  SELECT n, n * syy - sy * sy AS cyy, n * s11 - s1 * s1 AS c11,
      |    n * s22 - s2 * s2 AS c22, n * sy1 - sy * s1 AS cy1,
      |    n * sy2 - sy * s2 AS cy2, n * s12 - s1 * s2 AS c12
      |  FROM s),
      |f AS (
      |  SELECT CAST(n AS BIGINT) AS n_days,
      |    CASE WHEN CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
      |        - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE) > 0
      |    THEN ROUND((CAST(cy1 AS DOUBLE) * CAST(c22 AS DOUBLE)
      |        - CAST(cy2 AS DOUBLE) * CAST(c12 AS DOUBLE))
      |        / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
      |        - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)), 6)
      |    END AS coef_y_lag,
      |    CASE WHEN CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
      |        - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE) > 0
      |    THEN ROUND((CAST(cy2 AS DOUBLE) * CAST(c11 AS DOUBLE)
      |        - CAST(cy1 AS DOUBLE) * CAST(c12 AS DOUBLE))
      |        / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
      |        - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)), 6)
      |    END AS coef_x_lag,
      |    CASE WHEN c11 > 0 AND n > 3
      |      AND CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
      |        - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE) > 0
      |      AND CAST(cyy AS DOUBLE)
      |        - (CAST(cy1 AS DOUBLE) * CAST(cy1 AS DOUBLE)
      |            * CAST(c22 AS DOUBLE)
      |          + CAST(cy2 AS DOUBLE) * CAST(cy2 AS DOUBLE)
      |            * CAST(c11 AS DOUBLE)
      |          - 2 * CAST(cy1 AS DOUBLE) * CAST(cy2 AS DOUBLE)
      |            * CAST(c12 AS DOUBLE))
      |          / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
      |            - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE)) > 0
      |    THEN ROUND(
      |      ((CAST(cyy AS DOUBLE)
      |          - CAST(cy1 AS DOUBLE) * CAST(cy1 AS DOUBLE)
      |            / CAST(c11 AS DOUBLE))
      |       - (CAST(cyy AS DOUBLE)
      |          - (CAST(cy1 AS DOUBLE) * CAST(cy1 AS DOUBLE)
      |              * CAST(c22 AS DOUBLE)
      |            + CAST(cy2 AS DOUBLE) * CAST(cy2 AS DOUBLE)
      |              * CAST(c11 AS DOUBLE)
      |            - 2 * CAST(cy1 AS DOUBLE) * CAST(cy2 AS DOUBLE)
      |              * CAST(c12 AS DOUBLE))
      |            / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
      |              - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE))))
      |      * (CAST(n AS DOUBLE) - 3)
      |      / (CAST(cyy AS DOUBLE)
      |          - (CAST(cy1 AS DOUBLE) * CAST(cy1 AS DOUBLE)
      |              * CAST(c22 AS DOUBLE)
      |            + CAST(cy2 AS DOUBLE) * CAST(cy2 AS DOUBLE)
      |              * CAST(c11 AS DOUBLE)
      |            - 2 * CAST(cy1 AS DOUBLE) * CAST(cy2 AS DOUBLE)
      |              * CAST(c12 AS DOUBLE))
      |            / (CAST(c11 AS DOUBLE) * CAST(c22 AS DOUBLE)
      |              - CAST(c12 AS DOUBLE) * CAST(c12 AS DOUBLE))), 6)
      |    END AS f_stat
      |  FROM c)
      |SELECT n_days, coef_y_lag, coef_x_lag, f_stat,
      |  CASE WHEN f_stat IS NOT NULL THEN f_stat > 3.841459 END
      |    AS granger_05
      |FROM f""".stripMargin

  def all: Seq[(String, ((SparkSession, String) => DataFrame, String))] =
    Seq(
      "kendall_tau" -> ((kendallTau _, kendallTauSql)),
      "spearman_corr" -> ((spearmanCorr _, spearmanCorrSql)),
      "kruskal_wallis" -> ((kruskalWallis _, kruskalWallisSql)),
      "logrank_test" -> ((logrankTest _, logrankTestSql)),
      "attribution_shapley" ->
        ((attributionShapley _, attributionShapleySql)),
      "diff_in_diff" -> ((diffInDiff _, diffInDiffSql)),
      "granger_daily" -> ((grangerDaily _, grangerDailySql)))
}
