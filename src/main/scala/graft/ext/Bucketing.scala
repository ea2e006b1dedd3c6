package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bucketed table layout — the SHUFFLE-AT-REST strategy for recurring
  * co-located joins (SURVEY.md §2.12 / SCALE.md): pay the exchange ONCE
  * at write time (`bucketBy` on the join key, hash-partitioned files +
  * per-bucket sort), and every subsequent join or aggregation on that
  * key plans with ZERO runtime Exchange on the bucketed side — at 100 TB
  * the difference between re-shuffling the fact table per query and
  * never shuffling it again. This is the static sibling of
  * [[graft.ext.Skew]]'s runtime remedies and of AQE's dynamic re-plan:
  * fact tables with a stable join key (lineitem↔orders on orderkey)
  * earn a bucketed layout; ad-hoc keys stay with runtime shuffles.
  *
  * Spark-first posture: bucketing rides the session catalog
  * (`saveAsTable` — works on the default in-memory catalog; production
  * uses the metastore), `spark.sql.sources.bucketing.enabled` planning,
  * and SortMergeJoin's bucket-aware scan. BucketingSpec pins the plan
  * property that IS the feature: a merge join of the two bucketed tables
  * has NO ShuffleExchange under either child, while the same join on
  * raw parquet shuffles both sides.
  *
  * The registered `bucketed_join` query runs the layout end-to-end
  * (write bucketed once per session, join, aggregate) against a plain
  * SQL oracle — correctness of the co-located path, not just its shape.
  */
object Bucketing {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** Session-catalog table name for a corpus dir's bucketed copy —
    * dir-hashed so different scale factors in one JVM never collide.
    */
  private def tableFor(dir: String, table: String): String =
    s"graft_bkt_${table}_${graft.SparkUtil.dirKey(dir).take(8)}"

  /** Write-once-per-session bucketed copy of `table` on `keyCol`:
    * `repartition(buckets, key)` first so each bucket is ONE file
    * (multi-file buckets force a runtime re-sort that forfeits half the
    * benefit), then `bucketBy + sortBy` into the session catalog.
    * Returns the catalog table name.
    */
  def ensureBucketed(spark: SparkSession, dir: String, table: String,
      keyCol: String, buckets: Int = 8): String = synchronized {
    val t = tableFor(dir, table)
    if (!spark.catalog.tableExists(t)) {
      // the in-memory session catalog forgets tables across JVMs but
      // their warehouse dirs persist — sweep a stale location or
      // saveAsTable fails with LOCATION_ALREADY_EXISTS
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t.toLowerCase)
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(loc)) fs.delete(loc, true)
      Tables(spark, dir, table)
        .repartition(buckets, col(keyCol))
        .write.format("parquet")
        .bucketBy(buckets, keyCol).sortBy(keyCol)
        .mode("overwrite").saveAsTable(t)
    }
    t
  }

  /** The co-located join itself: lineitem ⋈ orders on orderkey, both
    * sides bucketed — revenue per order priority. The merge hint keeps
    * the demonstration honest (a broadcast of orders at test scale
    * would hide the bucket co-location the query exists to prove); at
    * fact×fact scale SMJ is what the planner picks anyway.
    */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = spark.table(ensureBucketed(spark, dir, "lineitem", "l_orderkey"))
    val o = spark.table(ensureBucketed(spark, dir, "orders", "o_orderkey"))
    li.hint("merge")
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  val bucketedJoinSql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Z-order (Morton) clustering key over `(l_partkey, l_suppkey)` —
    * the MULTI-dimensional layout complement to single-key bucketing:
    * interleaving the bits of two range-binned dimensions gives files
    * whose min/max fences are tight on BOTH columns, so a predicate on
    * either one prunes most of a 100 TB table at planning time (the
    * min/max-per-file skip that a single-column sort only provides for
    * its leading key). The registered query computes the 8-bit z-key
    * (4 bits per dimension, range-binned off the global max — one tiny
    * scalar agg broadcast, the house scalar-join idiom) and outputs the
    * per-bucket fences `(n, min/max of each dim)` — the statistics a
    * writer would persist as file-level metadata after
    * `repartitionByRange(zkey)`; their tightness IS the pruning
    * guarantee. Pure integer arithmetic end to end, so the oracle
    * replays bit-exactly.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey").cast("long").as("p"), col("l_suppkey").cast("long").as("s"))
    val bounds = li.agg(max("p").as("maxp"), max("s").as("maxs"))
    val binned = li.crossJoin(broadcast(bounds))
      .withColumn("bp", expr("(p * 16) div (maxp + 1)"))
      .withColumn("bs", expr("(s * 16) div (maxs + 1)"))
    val zkey = (0 until 4)
      .map(i => expr(s"shiftleft(shiftright(bp, $i) & 1, ${2 * i + 1}) " +
                     s"+ shiftleft(shiftright(bs, $i) & 1, ${2 * i})"))
      .reduce(_ + _)
    binned.withColumn("zkey", zkey)
      .groupBy("zkey")
      .agg(count(lit(1)).as("n"),
        min("p").as("min_part"), max("p").as("max_part"),
        min("s").as("min_supp"), max("s").as("max_supp"))
  }

  val zorderLayoutSql: String =
    """WITH li AS (SELECT CAST(l_partkey AS BIGINT) AS p, CAST(l_suppkey AS BIGINT) AS s
      |            FROM lineitem),
      |b AS (SELECT MAX(p) AS maxp, MAX(s) AS maxs FROM li),
      |z AS (SELECT p, s, (p * 16) // (maxp + 1) AS bp, (s * 16) // (maxs + 1) AS bs
      |      FROM li CROSS JOIN b),
      |k AS (SELECT p, s,
      |        CAST((((bp >> 0) & 1) << 1) + (((bs >> 0) & 1) << 0)
      |           + (((bp >> 1) & 1) << 3) + (((bs >> 1) & 1) << 2)
      |           + (((bp >> 2) & 1) << 5) + (((bs >> 2) & 1) << 4)
      |           + (((bp >> 3) & 1) << 7) + (((bs >> 3) & 1) << 6) AS BIGINT) AS zkey
      |      FROM z)
      |SELECT zkey, COUNT(*) AS n,
      |  MIN(p) AS min_part, MAX(p) AS max_part,
      |  MIN(s) AS min_supp, MAX(s) AS max_supp
      |FROM k GROUP BY zkey""".stripMargin

  /** Equi-depth range-partition boundaries for `lineitem.l_orderkey` —
    * what `repartitionByRange` computes internally by sampling, exposed
    * as a deterministic, oracle-checkable pass: ONE aggregation bins the
    * key into 1024 fixed-width integer bins (histogram), the cumulative
    * sum runs on that 1024-row aggregate (never the corpus), and each of
    * the 8 target partitions gets the first bin edge whose cumulative
    * count reaches `i/8` of the total. Boundaries are accurate to one
    * bin width — the same tradeoff as Spark's reservoir sampling, but
    * reproducible run-to-run, which is what a persisted 100 TB layout
    * needs (re-ingest must not reshuffle files because a sample moved).
    */
  def rangePartitionBounds(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, dir, "lineitem").select(col("l_orderkey").cast("long").as("k"))
    val bounds = li.agg(max("k").as("maxk"))
    val hist = li.crossJoin(broadcast(bounds))
      .withColumn("bin", expr("(k * 1024) div (maxk + 1)"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    // tiny-side window: cumulative over ≤1024 aggregated rows
    val w = Window.partitionBy().orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("cum", sum("n").over(w))
      .withColumn("total", sum("n").over(Window.partitionBy()))
    cum.crossJoin(spark.range(1, 8).toDF("part_idx"))
      .filter(col("cum") * 8 >= col("part_idx") * col("total"))
      .groupBy("part_idx")
      // first bin reaching the i/8 depth; its LOWER EDGE in key space is
      // the split point a range writer persists
      .agg(min("bin").as("bin"))
      .crossJoin(broadcast(bounds))
      .select(col("part_idx"),
        expr("(bin * (maxk + 1)) div 1024").as("split_key"))
  }

  val rangePartitionBoundsSql: String =
    """WITH li AS (SELECT CAST(l_orderkey AS BIGINT) AS k FROM lineitem),
      |b AS (SELECT MAX(k) AS maxk FROM li),
      |h AS (SELECT (k * 1024) // (maxk + 1) AS bin, COUNT(*) AS n
      |      FROM li CROSS JOIN b GROUP BY 1),
      |c AS (SELECT bin, SUM(n) OVER (ORDER BY bin) AS cum, SUM(n) OVER () AS total FROM h),
      |p AS (SELECT part_idx, MIN(bin) AS bin
      |      FROM c CROSS JOIN (SELECT UNNEST(range(1, 8)) AS part_idx)
      |      WHERE cum * 8 >= part_idx * total
      |      GROUP BY part_idx)
      |SELECT part_idx, (bin * (maxk + 1)) // 1024 AS split_key
      |FROM p CROSS JOIN b""".stripMargin

  /** Partition-count sizing pass: per table, exact row count plus a
    * deterministic byte estimate (fixed per-type widths + the measured
    * mean width of each string column — ONE aggregation per table, no
    * second pass), and the resulting 128 MiB-target partition count.
    * This is the number an operator feeds `spark.sql.files
    * .maxPartitionBytes` / `repartition` before a 100 TB write; making
    * it a registered query keeps the sizing logic itself under the
    * oracle, not in a notebook.
    */
  def partitionPlan(spark: SparkSession, dir: String): DataFrame = {
    val target = 134217728L // 128 MiB
    def plan(table: String, fixed: Int, strCols: Seq[String]): DataFrame = {
      val t = Tables(spark, dir, table)
      val strBytes: Column = strCols
        .map(c => coalesce(sum(length(col(c))), lit(0L)))
        .foldLeft(lit(0L): Column)(_ + _)
      t.agg(count(lit(1)).as("n_rows"),
          (strBytes + count(lit(1)) * fixed).as("est_bytes"))
        .select(lit(table).as("table_name"), col("n_rows"), col("est_bytes"),
          // ceil-div in integer space; empty table still plans 1 partition
          greatest(expr(s"(est_bytes + ${target - 1}) div $target"), lit(1L))
            .as("n_parts_128mb"))
    }
    Seq(
      plan("lineitem", 8 * 4 + 8 * 3 + 4, Seq("l_returnflag", "l_linestatus")),
      plan("orders", 8 * 4, Seq("o_orderpriority", "o_orderstatus")),
      plan("events", 8 * 4, Seq("event_type", "props")),
      plan("documents", 8 * 2, Seq("text", "lang", "source"))
    ).reduce(_.unionByName(_))
  }

  val partitionPlanSql: String = {
    def one(table: String, fixed: Int, strCols: Seq[String]): String = {
      val strBytes =
        if (strCols.isEmpty) "0"
        else strCols.map(c => s"COALESCE(SUM(LENGTH($c)), 0)").mkString(" + ")
      s"""SELECT '$table' AS table_name, COUNT(*) AS n_rows,
         |  CAST($strBytes + COUNT(*) * $fixed AS BIGINT) AS est_bytes,
         |  CAST(GREATEST(($strBytes + COUNT(*) * $fixed + 134217727) // 134217728, 1) AS BIGINT)
         |    AS n_parts_128mb
         |FROM $table""".stripMargin
    }
    Seq(
      one("lineitem", 8 * 4 + 8 * 3 + 4, Seq("l_returnflag", "l_linestatus")),
      one("orders", 8 * 4, Seq("o_orderpriority", "o_orderstatus")),
      one("events", 8 * 4, Seq("event_type", "props")),
      one("documents", 8 * 2, Seq("text", "lang", "source"))
    ).mkString("\nUNION ALL\n")
  }

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "bucketed_join" -> ((bucketedJoin _, bucketedJoinSql)),
    "zorder_layout" -> ((zorderLayout _, zorderLayoutSql)),
    "range_partition_bounds" -> ((rangePartitionBounds _, rangePartitionBoundsSql)),
    "partition_plan" -> ((partitionPlan _, partitionPlanSql))
  )
}
