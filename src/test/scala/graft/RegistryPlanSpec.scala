package graft

/** Every registered query must ANALYZE and OPTIMIZE against the real
  * testdata — no execution, so the whole registry checks in seconds.
  *
  * Insurance born of the r6 events drift: a testdata schema change
  * surfaced as an AnalysisException in the DRIVER's correctness run,
  * because nothing in `sbt test` touched the broken queries' plans.
  * SchemaGuardSpec now pins the schemas themselves; this spec closes the
  * remaining gap — any registration whose expression tree no longer
  * resolves (renamed column, type mismatch, bad SQL fragment) fails here
  * with the query's name, before the driver ever runs.
  */
class RegistryPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("all registered queries analyze and optimize against the testdata") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        // optimizedPlan forces analysis + optimization (not execution)
        fn(spark, dir).queryExecution.optimizedPlan
        None
      } catch {
        case e: Throwable =>
          Some(s"$name: ${e.toString.linesIterator.next().take(200)}")
      }
    }
    spark.catalog.clearCache() // some builders persist projections
    assert(bad.isEmpty, s"${bad.size} queries failed to plan:\n" + bad.mkString("\n"))
  }

  test("every oracle entry pairs with a registered query and is non-empty") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracleSql without a query: $orphans")
    // the RAW suite tuples, not the filtered map: Registry.oracleSql
    // silently drops null/empty entries, so an accidental empty-string
    // oracle (≠ the sanctioned null rows-only marker) would otherwise
    // silently degrade a query's gate without failing anywhere
    val empty = graft.queries.Registry.rawOracleEntries
      .collect { case (k, v) if v != null && v.trim.isEmpty => k }
    assert(empty.isEmpty, s"EMPTY-STRING oracle SQL (use null for rows-only): $empty")
  }

  test("every registered query carries an oracle (no rows-only gates left)") {
    // since r8 the six sketch queries register their deterministic
    // ENVELOPE forms (exact ride-alongs + the asserted within-envelope
    // boolean; raw estimates live in unregistered *Raw variants), so a
    // NULL oracle is no longer sanctioned for anything — null here means
    // a val-initialization-order accident interpolating null into an
    // oracle string (split_leakage_safe hit exactly that in r7)
    val actual = graft.queries.Registry.rawOracleEntries
      .collect { case (k, v) if v == null => k }.toSet
    assert(actual.isEmpty, s"queries registered without an oracle: $actual")
  }
}
