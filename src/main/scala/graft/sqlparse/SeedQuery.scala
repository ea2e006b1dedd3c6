package graft.sqlparse

/** Seed-query parsing (SURVEY.md §2.3).
  *
  * The reference pulls the driving table out of the user's seed SQL with
  * one regex (`getQueryTable`, `/root/reference/etl/util.go:19-46`,
  * tested in `etl/util_test.go:9-13`). We keep a regex with the same
  * observable behavior for parity, plus a robust fallback through Spark's
  * SQL parser (collect `UnresolvedRelation` leaves) for queries the regex
  * can't see through.
  */
object SeedQuery {

  // Same shape as the reference's `queryReg` (`etl/util.go:19`):
  // `^(?i)SELECT (?P<columns>.*[^T]) FROM (?P<table>\w+).*`
  private val QueryRe = raw"(?is)^\s*SELECT\s+(.*?)\s+FROM\s+(\w+).*".r

  /** Driving table of a seed query, or None if unparseable. */
  def drivingTable(query: String): Option[String] = query match {
    case QueryRe(_, table) => Some(table)
    case _                 => None
  }

  /** All base relations referenced by a query, via Spark's own parser —
    * robust where the regex is fragile (subqueries, joins, CTEs).
    */
  def relations(spark: org.apache.spark.sql.SparkSession, query: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    val plan = spark.sessionState.sqlParser.parsePlan(query)
    // collectWithSubqueries also descends into IN/EXISTS subquery plans
    plan.collectWithSubqueries {
      case r: UnresolvedRelation => r.multipartIdentifier.last
    }.distinct
  }

  /** `{attr}` template substitution against a key/value row — the
    * reference's `replaceVar` (`/root/reference/etl/sanitizer.go:110-124`)
    * used for config queries (`etl/extractor.go:72`). Driver-side (these
    * are per-distinct-parameter-tuple, bounded).
    */
  def substitute(template: String, row: Map[String, Any]): String =
    raw"\{(\w+)\}".r.replaceAllIn(template, m =>
      scala.util.matching.Regex.quoteReplacement(
        row.get(m.group(1)).map(String.valueOf).getOrElse(m.matched)))
}
