package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Correlated-subquery surface — the decorrelation capability class.
  *
  * The reference delegates subqueries to PostgreSQL's planner
  * (ulule/mover runs its seed/config queries verbatim —
  * `pkg/mover/extract.go` hands the SQL to the server); a standalone
  * engine must DECORRELATE them itself: a per-row correlated aggregate
  * naively re-executes the inner query once per outer row — O(n·m), a
  * non-starter at 100 TB — while the decorrelated form is ONE
  * aggregation plus ONE join. These queries are deliberately authored
  * as SQL (`spark.sql` over temp views of the parquet tables) so the
  * plans come out of Catalyst's own rewrite stack
  * (`RewriteCorrelatedScalarSubquery`, `RewritePredicateSubquery`,
  * `MergeScalarSubqueries`), not a hand decorrelation: SubquerySpec
  * pins that the optimized plans contain joins + aggregates and no
  * per-row subquery execution, and pins result equality with an
  * explicit DataFrame-API decorrelation of the same semantics.
  *
  * Determinism discipline: every correlated comparison is MULTIPLIED
  * OUT so no division ever runs — `qty < 0.2·avg(qty)` becomes
  * `5·qty·count < sum` over exact BIGINTs (quantities are integral),
  * and the balance-above-mean predicate compares
  * `bal·n > Σbal` in DECIMAL. Both engines then evaluate identical
  * integer/decimal trees, so the driver's hash compare is exact.
  */
object SubqueryQueries {

  /** Register the named testdata tables as temp views for spark.sql. */
  private def views(spark: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => Tables(spark, dir, n).createOrReplaceTempView(n))

  /** TPC-H Q17 shape (small-quantity revenue): lineitems whose quantity
    * is below 20% of their part's average quantity. The predicate holds
    * TWO correlated scalar aggregates over lineitem (count and sum per
    * l_partkey); Catalyst decorrelates each into a bounded per-partkey
    * aggregate joined back on the correlation key — never a per-outer-row
    * re-execution. (It does NOT merge the two into one shared aggregate:
    * `MergeScalarSubqueries` doesn't fire on this predicate position, so
    * the SQL form scans lineitem three times; SubquerySpec pins equality
    * with the hand-decorrelated single-aggregate DataFrame form — one
    * `groupBy(l_partkey).agg(count, sum)` + one join, two scans — which
    * is the shape a 100 TB run would author directly when the extra scan
    * matters.) `0.2·avg` is multiplied out to
    * `5·qty·count < sum` in BIGINT: exact, division-free, and integral
    * because the synthetic quantities are whole numbers.
    */
  def corrSmallQty(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "lineitem", "part")
    spark.sql(corrSmallQtySql)
  }

  val corrSmallQtySql: String =
    """SELECT p.p_brand,
      |  COUNT(*) AS n_small,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE CAST(l.l_quantity AS BIGINT) * 5 *
      |      (SELECT COUNT(*) FROM lineitem l2
      |       WHERE l2.l_partkey = l.l_partkey)
      |    < (SELECT CAST(SUM(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
      |       FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
      |GROUP BY p.p_brand
      |ORDER BY p.p_brand""".stripMargin

  /** TPC-H Q18 shape (large-volume orders): orders whose total lineitem
    * quantity reaches 300, with the quantity surfaced via a correlated
    * scalar subquery in the SELECT list. Exercises BOTH predicate-
    * subquery classes at once: the `IN (… GROUP BY … HAVING …)`
    * membership test rewrites to a LEFT SEMI join against the
    * aggregated lineitem (`RewritePredicateSubquery`), and the SELECT
    * subquery decorrelates to an aggregate join. Top-20 by quantity
    * with the unique o_orderkey tiebreak, so the LIMIT is
    * deterministic; at scale the ORDER BY+LIMIT executes as
    * TakeOrdered, never a global sort.
    */
  def corrBigOrders(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "lineitem", "orders", "customer")
    spark.sql(corrBigOrdersSql)
  }

  val corrBigOrdersSql: String =
    """SELECT c.c_name, o.o_orderkey,
      |  CAST(o.o_totalprice AS DOUBLE) AS total,
      |  (SELECT CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
      |   FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS total_qty
      |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |WHERE o.o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey
      |  HAVING SUM(CAST(l_quantity AS BIGINT)) >= 300)
      |ORDER BY total_qty DESC, o.o_orderkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q22 shape (wealthy low-activity customers): customers whose
    * balance exceeds the positive-balance mean but who placed fewer
    * than 8 orders, rolled up per nation. Mixes an UNCORRELATED scalar
    * subquery pair (the mean, multiplied out to `bal·n > Σbal` in
    * DECIMAL — computed ONCE and broadcast into the predicate, never
    * per-row) with a correlated COUNT over orders (decorrelated to an
    * aggregate + left join on c_custkey; the count-bug case — customers
    * with zero orders must count 0, not NULL — is handled by Catalyst's
    * null-safe count rewrite, and is exactly the case a naive outer-join
    * translation gets wrong).
    */
  def corrIdleCustomers(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "customer", "orders")
    spark.sql(corrIdleCustomersSql)
  }

  val corrIdleCustomersSql: String =
    """SELECT c.c_nationkey,
      |  COUNT(*) AS n_idle,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      |FROM customer c
      |WHERE CAST(c.c_acctbal AS DECIMAL(18,4)) *
      |        (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
      |      > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DECIMAL(28,4))
      |         FROM customer WHERE c_acctbal > 0)
      |  AND (SELECT COUNT(*) FROM orders o
      |       WHERE o.o_custkey = c.c_custkey) < 8
      |GROUP BY c.c_nationkey
      |ORDER BY c.c_nationkey""".stripMargin

  /** LATERAL correlated top-k (per-nation two wealthiest customers):
    * the lateral-subquery surface — `FROM nation, LATERAL (… WHERE
    * correlated ORDER BY … LIMIT 2)`. A naive evaluation runs the inner
    * query once per nation row; Catalyst's `DecorrelateInnerQuery`
    * handles the correlated LIMIT by rewriting it into a per-key
    * ranking over ONE scan of customer joined back to nation —
    * SubquerySpec pins the rewrite (single customer scan, no loop) and
    * equality with the explicit window-function formulation. The
    * deterministic `(c_acctbal DESC, c_custkey)` inner order makes the
    * LIMIT reproducible.
    */
  def lateralTopk(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "nation", "customer")
    spark.sql(lateralTopkSql)
  }

  val lateralTopkSql: String =
    """SELECT n.n_name, t.c_custkey, t.bal
      |FROM nation n,
      |  LATERAL (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
      |           FROM customer c
      |           WHERE c.c_nationkey = n.n_nationkey
      |           ORDER BY c_acctbal DESC, c_custkey
      |           LIMIT 2) t
      |ORDER BY n.n_name, t.bal DESC, t.c_custkey""".stripMargin

  /** TPC-H Q2 shape (min-cost supplier): the per-part supplier(s)
    * achieving the MINIMUM supply total, selected by EQUALITY to a
    * correlated aggregate — `total = (SELECT MIN(…) WHERE same part)`,
    * the third correlated-comparison class after Q17's `<` and Q22's
    * counted predicate. Catalyst decorrelates the MIN into a per-part
    * aggregate joined back on the correlation key; the shared `ps` CTE
    * keeps both sides on one definition. Exactness: totals stay
    * DECIMAL through the MIN and the equality (ties — multiple
    * suppliers at the exact minimum — are all kept, like Q2), cast to
    * double only for display.
    */
  def corrMinCost(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "lineitem")
    spark.sql(corrMinCostSql)
  }

  val corrMinCostSql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS total
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT a.l_partkey, a.l_suppkey, CAST(a.total AS DOUBLE) AS total
      |FROM ps a
      |WHERE a.l_partkey <= 50
      |  AND a.total = (SELECT MIN(b.total) FROM ps b
      |                 WHERE b.l_partkey = a.l_partkey)
      |ORDER BY a.l_partkey, a.l_suppkey""".stripMargin

  /** Nested EXISTS (returning customers per nation): the predicate
    * subquery holds a JOIN — orders to returned lineitems — so the
    * rewrite (`RewritePredicateSubquery`) must plan a left-semi join
    * whose build side is itself a two-table join, pushed filters and
    * all. The count-per-nation rollup keeps the output dimension-sized.
    */
  def existsReturned(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "customer", "orders", "lineitem")
    spark.sql(existsReturnedSql)
  }

  val existsReturnedSql: String =
    """SELECT c.c_nationkey, COUNT(*) AS n_returners
      |FROM customer c
      |WHERE EXISTS (
      |  SELECT 1 FROM orders o
      |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |  WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R')
      |GROUP BY c.c_nationkey
      |ORDER BY c.c_nationkey""".stripMargin

  /** TPC-H Q21 shape (waiting suppliers): the EXISTS + NOT-EXISTS pair
    * over the SAME fact table, both correlated to the outer row's order
    * — the hardest decorrelation shape in the TPC-H suite. Adapted to
    * this schema's columns: "late" is `l_shipdate > o_orderdate + 60
    * days` (no receipt/commit dates in the synthetic lineitem), order
    * status 'F'. Semantics: count, per supplier, the late lines in
    * multi-supplier orders where that supplier was the ONLY late one.
    * The NOT-EXISTS branch correlates on BOTH l1 (the sibling filter)
    * and o (the lateness bound) — Catalyst rewrites the pair into a
    * left-semi and a left-anti join against lineitem with the non-equi
    * lateness predicate folded into the join condition; SubquerySpec
    * pins equality with a hand-decorrelated per-order aggregate
    * (n_suppliers ≥ 2 ∧ n_late_suppliers = 1), which is also the form
    * that proves the counts rather than re-asserting them.
    */
  def corrLateSupplier(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "supplier", "lineitem", "orders")
    spark.sql(corrLateSupplierSql)
  }

  val corrLateSupplierSql: String =
    """SELECT s.s_name, COUNT(*) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
      |WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s.s_name
      |LIMIT 20""".stripMargin

  /** TPC-H Q4 shape (order priority checking): EXISTS correlated on the
    * order key AND a non-equi lateness bound on the outer's own date
    * column — rewritten to one left-semi join against lineitem with the
    * bound in the join condition; the date window pushes into the
    * orders scan. The simplest member of the EXISTS family, registered
    * so the rewrite is pinned from simple (Q4) through hard (Q21).
    */
  def q4PriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "orders", "lineitem")
    spark.sql(q4PriorityCheckSql)
  }

  val q4PriorityCheckSql: String =
    """SELECT o.o_orderpriority, COUNT(*) AS order_count
      |FROM orders o
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l
      |    WHERE l.l_orderkey = o.o_orderkey
      |      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  /** TPC-H Q16 shape (parts/supplier relationship): COUNT(DISTINCT)
    * per group behind a NOT IN whose subquery is an uncorrelated
    * selective set — Catalyst turns the NOT IN into a null-aware
    * left-anti join (safe here: keys are non-null), and the distinct
    * count shuffles once on the group keys. Top-20 with a full tie
    * order.
    */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "part", "lineitem", "supplier")
    spark.sql(q16SupplierCntSql)
  }

  val q16SupplierCntSql: String =
    """SELECT p.p_brand, p.p_size,
      |  COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      |WHERE p.p_brand <> 'Brand#1'
      |  AND l.l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_nationkey = 0)
      |GROUP BY p.p_brand, p.p_size
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
      |LIMIT 20""".stripMargin

  /** TPC-H Q11 shape (important stock): a grouped aggregate filtered
    * against a SCALAR SUBQUERY over the same fact (group value >
    * 1.5× the average per-part quantity) — the uncorrelated-scalar
    * HAVING case with TWO scalar subqueries (total and distinct-part
    * count), the comparison cross-multiplied to exact BIGINT
    * (`2·group·n_parts > 3·total`) so no division ever runs. (No
    * partsupp in this schema; shipped quantity stands in for stock
    * value, and the relative threshold keeps the result non-empty at
    * every scale where TPC-H's absolute 0.1% would return nothing on
    * this flat synthetic distribution.)
    */
  def q11ImportantParts(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "lineitem")
    spark.sql(q11ImportantPartsSql)
  }

  val q11ImportantPartsSql: String =
    """SELECT l_partkey,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS part_qty
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING SUM(CAST(l_quantity AS BIGINT))
      |    * (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) * 2 >
      |  (SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem) * 3
      |ORDER BY part_qty DESC, l_partkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q20 shape (excess volume): IN whose subquery filters on a
    * CORRELATED scalar aggregate over a DERIVED grouped table — the
    * supplier-part pairs holding their part's MAXIMUM shipped volume
    * (the plurality holders, non-empty by construction), then the
    * suppliers behind them. Two decorrelation layers: the correlated
    * MAX over the derived aggregate becomes a per-part aggregate
    * joined back on the correlation key, the IN becomes a left-semi
    * join. Exact BIGINT volumes; `>=` against the max keeps every
    * tied pair.
    */
  def q20VolumeShare(spark: SparkSession, dir: String): DataFrame = {
    views(spark, dir, "supplier", "lineitem")
    spark.sql(q20VolumeShareSql)
  }

  val q20VolumeShareSql: String =
    """SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT lp.l_suppkey FROM (
      |    SELECT l_suppkey, l_partkey,
      |      SUM(CAST(l_quantity AS BIGINT)) AS vol
      |    FROM lineitem GROUP BY l_suppkey, l_partkey) lp
      |  WHERE lp.vol >= (
      |    SELECT MAX(lp2.vol) FROM (
      |      SELECT l_suppkey, l_partkey,
      |        SUM(CAST(l_quantity AS BIGINT)) AS vol
      |      FROM lineitem GROUP BY l_suppkey, l_partkey) lp2
      |    WHERE lp2.l_partkey = lp.l_partkey))
      |ORDER BY s.s_suppkey""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "corr_late_supplier" -> ((corrLateSupplier _, corrLateSupplierSql)),
    "q11_important_parts" -> ((q11ImportantParts _, q11ImportantPartsSql)),
    "q20_volume_share" -> ((q20VolumeShare _, q20VolumeShareSql)),
    "q4_priority_check" -> ((q4PriorityCheck _, q4PriorityCheckSql)),
    "q16_supplier_cnt" -> ((q16SupplierCnt _, q16SupplierCntSql)),
    "corr_min_cost" -> ((corrMinCost _, corrMinCostSql)),
    "exists_returned" -> ((existsReturned _, existsReturnedSql)),
    "lateral_topk" -> ((lateralTopk _, lateralTopkSql)),
    "corr_small_qty" -> ((corrSmallQty _, corrSmallQtySql)),
    "corr_big_orders" -> ((corrBigOrders _, corrBigOrdersSql)),
    "corr_idle_customers" -> ((corrIdleCustomers _, corrIdleCustomersSql))
  )
}
