package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over catalog-derived graphs (SURVEY.md §2 ext tier) —
  * the operator family next to the dedup tier's connected components:
  * iterative whole-graph metrics expressed as joins + aggregations, the
  * shape Pregel-style engines compile to anyway.
  *
  * PageRank is run in EXACT INTEGER arithmetic so the DuckDB oracle can
  * replay every iteration bit-for-bit (the same discipline as
  * [[KMeans]]): ranks are scaled to 10¹² "mass units", per-edge
  * contributions are integer division `rank div degree` (the dropped
  * remainder is part of the operator's defined semantics, not error),
  * and the damping update is the rational `(15·S + 85·Σ) div 100` —
  * no float ever enters, so sums are order-free and ties in the final
  * ranking resolve identically on both engines.
  */
object GraphQueries {

  private val RankScale = 1000000000000L // 10^12 mass units per node
  private val Iters = 3

  /** PageRank over the bipartite part↔supplier supply graph (distinct
    * `(l_partkey, l_suppkey)` pairs, both directions, so every node has
    * in-edges and the dangling-mass term vanishes). Node ids share one
    * space: parts are even (2·partkey), suppliers odd (2·suppkey+1).
    *
    * Scale shape: the edge list is built ONCE, joined with its
    * source-degree table, repartitioned on `s` and persisted — the
    * cached hash partitioning serves the rank join every iteration
    * without re-exchanging the edges (only the small rank table moves).
    * Each round is one join + one map-side-combined groupBy(t) — the
    * canonical distributed PageRank step; rank state never collects to
    * the driver. Output: top-20 nodes by rank, fully tie-broken.
    */
  def pageRank(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables(spark, dir, "lineitem")
      .select((col("l_partkey").cast("long") * 2).as("s"),
        (col("l_suppkey").cast("long") * 2 + 1).as("t"))
      .distinct()
    pageRankOn(e0)
  }

  /** The iterative core over a distinct directed edge list `(s, t)`,
    * symmetrized before ranking (see [[pageRank]] for the semantics).
    */
  private[ext] def pageRankOn(e0: DataFrame): DataFrame = {
    val e = e0.unionByName(e0.select(col("t").as("s"), col("s").as("t")))
    val deg = e.groupBy("s").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "s").repartition(col("s")).persist()
    try {
      val init = deg.select(col("s").as("node"), lit(RankScale).as("rank"))
      val ranks = (1 to Iters).foldLeft(init) { (r, _) =>
        ed.join(r.withColumnRenamed("node", "s"), "s")
          .select(col("t"), expr("rank div deg").as("contrib"))
          .groupBy("t")
          .agg(expr(s"(15 * ${RankScale}L + 85 * sum(contrib)) div 100").as("rank"))
          .select(col("t").as("node"), col("rank"))
      }
      // global top-k plans as TakeOrdered, never a total-order exchange
      val out = ranks.orderBy(desc("rank"), asc("node")).limit(20)
        .localCheckpoint()
      out
    } finally ed.unpersist()
  }

  private def rankIterSql(i: Int): String =
    s"""r$i AS (SELECT e.t AS node,
       |    CAST((15 * $RankScale + 85 * SUM(r${i - 1}.rank // d.deg)) // 100 AS BIGINT) AS rank
       |  FROM e JOIN r${i - 1} ON e.s = r${i - 1}.node JOIN d ON e.s = d.node
       |  GROUP BY e.t),""".stripMargin

  val pageRankSql: String = {
    val rounds = (1 to Iters).map(rankIterSql).mkString("\n")
    s"""WITH e0 AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) * 2 AS s,
       |                   CAST(l_suppkey AS BIGINT) * 2 + 1 AS t FROM lineitem),
       |e AS (SELECT s, t FROM e0 UNION ALL SELECT t AS s, s AS t FROM e0),
       |d AS (SELECT s AS node, COUNT(*) AS deg FROM e GROUP BY s),
       |r0 AS (SELECT node, CAST($RankScale AS BIGINT) AS rank FROM d),
       |$rounds
       |fin AS (SELECT node, rank FROM r$Iters)
       |SELECT node, rank FROM fin ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  def all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "pagerank_supply" -> ((pageRank _, pageRankSql))
  )
}
