package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregates every operator suite into the driver-facing maps.
  * Suites register `(name -> (impl, oracleSqlOrNull))`; a null/empty
  * oracle means the op is not SQL-expressible in DuckDB (driver falls
  * back to a rows-only check).
  */
object Registry {
  private def suites: Seq[Seq[(String, ((SparkSession, String) => DataFrame, String))]] =
    Seq(CoreQueries.all, SanitizeQueries.all, EngineQueries.all, OlapQueries.all,
      AuditQueries.all, SubqueryQueries.all,
      graft.ext.TextQueries.all, graft.ext.DedupQueries.all,
      graft.ext.SimilarityQueries.all, graft.ext.KMeans.all,
      graft.ext.EventQueries.all,
      graft.ext.Multimodal.all, graft.ext.CurationQueries.all,
      graft.ext.Bucketing.all, graft.ext.GraphQueries.all,
      graft.ext.RollupIndex.all, graft.ext.StatsQueries.all,
      graft.ext.PhraseQueries.all)

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = suites.flatten
    val dups = all.groupBy(_._1).filter(_._2.size > 1).keys
    // toMap would silently keep the LAST registration — a suite collision
    // must fail the build, not shadow an operator out of the gate
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    all.map { case (n, (f, _)) => n -> f }.toMap
  }

  lazy val oracleSql: Map[String, String] =
    suites.flatten.collect { case (n, (_, sql)) if sql != null && sql.nonEmpty => n -> sql }.toMap

  /** UNFILTERED (name, oracleSqlOrNull) pairs — for test assertions on
    * registration hygiene; `oracleSql` above silently drops null/empty
    * entries, so a guard against accidental empty-string oracles must
    * look here, not at the filtered map.
    */
  private[graft] def rawOracleEntries: Seq[(String, String)] =
    suites.flatten.map { case (n, (_, sql)) => n -> sql }
}
