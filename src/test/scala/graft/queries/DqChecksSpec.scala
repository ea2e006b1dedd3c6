package graft.queries

import graft.SparkSpec

/** The synthetic tables are clean, so the registered `dq_checks` oracle
  * only proves the all-pass case. This spec PLANTS one violation of
  * each kind — a null key, a duplicated key, a rogue status value, an
  * out-of-range quantity — and pins the exact violation counts,
  * including the null-scoping rule (accepted_values / in_range ignore
  * NULLs; not_null owns them).
  */
class DqChecksSpec extends SparkSpec {

  test("planted violations are counted exactly, nulls scoped to not_null") {
    import spark.implicits._
    import AuditQueries._

    val customer = Seq[(Option[Long], String)](
      (Some(1L), "a"), (Some(2L), "b"), (Some(2L), "c"), (None, "d"))
      .toDF("c_custkey", "c_name")
    val rows = dqAudit(customer, "customer",
        Seq(NotNull("c_custkey"), UniqueKey("c_custkey"), NotNull("c_name")))
      .collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        ((r.getLong(4), r.getBoolean(5)))).toMap
    assert(rows(("not_null", "c_custkey")) == ((1L, false))) // the None key
    // unique counts NON-NULL keys: 3 non-null, 2 distinct → 1 violation
    assert(rows(("unique_key", "c_custkey")) == ((1L, false)))
    assert(rows(("not_null", "c_name")) == ((0L, true)))

    val orders = Seq[(Option[String], Long)](
      (Some("F"), 1), (Some("X"), 2), (None, 3)).toDF("o_orderstatus", "o_custkey")
    val acc = dqAudit(orders, "orders",
        Seq(AcceptedValues("o_orderstatus", Seq("F", "O", "P"))))
      .collect().head
    // only the non-null 'X' violates; the NULL is not this check's job
    assert(acc.getLong(4) == 1L && !acc.getBoolean(5))

    val li = Seq[Option[Double]](Some(0.5), Some(25.0), Some(51.0), None)
      .toDF("l_quantity")
    val rng = dqAudit(li, "lineitem", Seq(InRange("l_quantity", 1, 50)))
      .collect().head
    assert(rng.getLong(4) == 2L && !rng.getBoolean(5)) // 0.5 and 51, not the NULL

    // clean testdata: every registered check passes
    val all = dqChecks(spark, "/root/testdata/sf0.001").collect()
    assert(all.length == 9 && all.forall(_.getBoolean(5)))
  }
}
