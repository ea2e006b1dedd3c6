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
      graft.ext.TextQueries.all, graft.ext.DedupQueries.all,
      graft.ext.SimilarityQueries.all, graft.ext.EventQueries.all,
      graft.ext.Multimodal.all, graft.ext.CurationQueries.all)

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.flatten.map { case (n, (f, _)) => n -> f }.toMap

  lazy val oracleSql: Map[String, String] =
    suites.flatten.collect { case (n, (_, sql)) if sql != null && sql.nonEmpty => n -> sql }.toMap
}
