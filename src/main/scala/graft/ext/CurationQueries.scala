package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end corpus curation — the decision a training-data pipeline
  * actually ships: for every document, keep it or drop it WITH the
  * reason, composing the text-quality tier and the near-dup cluster tier:
  *
  *  1. `low_quality`: composite quality score (the [[TextQueries]]
  *     formula) below threshold — cheap narrow projection, evaluated
  *     first so junk never reaches the expensive stages;
  *  2. `near_dup`: the document belongs to an LSH near-dup cluster
  *     ([[DedupQueries.dedupClusters]]) and is not its representative
  *     (min doc_id) — one doc survives per cluster;
  *  3. `keep` otherwise.
  *
  * At 100 TB this composition is the whole point of the operator tier:
  * the quality projection is scan-bound, the cluster side is the bounded
  * LSH pipeline, and the final decision is one left join on doc_id. The
  * DuckDB oracle replays the identical pipeline (recursive-CTE connected
  * components included), so the END-TO-END decision is hash-checked, not
  * just the stages.
  */
object CurationQueries {

  private val threshold = 0.5

  def corpusCuration(spark: SparkSession, dir: String): DataFrame = {
    val quality = Tables(spark, dir, "documents")
      .select(col("doc_id"), TextQueries.qualityScore.as("q"))
    // read from the persisted cluster index (one CC fixpoint per
    // session, shared with split_leakage_safe) — see [[ClusterIndex]]
    val clusters = ClusterIndex.forCorpus(spark, dir)
    quality
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), col("q").as("quality_score"),
        when(col("q") < threshold, "low_quality")
          .when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"),
            "near_dup")
          .otherwise("keep").as("decision"))
      .orderBy("doc_id")
  }

  val corpusCurationSql: String =
    s"""WITH RECURSIVE ${DedupQueries.ccSqlCtes},
      |quality AS (
      |  SELECT doc_id, ${TextQueries.qualityScoreSql} AS q
      |  FROM documents)
      |SELECT d.doc_id, d.q AS quality_score,
      |  CASE WHEN d.q < $threshold THEN 'low_quality'
      |       WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> d.doc_id THEN 'near_dup'
      |       ELSE 'keep' END AS decision
      |FROM quality d LEFT JOIN clusters c ON c.doc_id = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Benchmark decontamination — flag training documents that share any
    * word 5-gram with the eval set (the overlap check every serious
    * pretraining pipeline runs before training; 13-grams in the GPT-3
    * writeup, 5 here because the synthetic docs are short). Here the
    * "eval set" is doc_id < 10; in production it is the benchmark suite.
    *
    * Scale shape: the eval side is SMALL BY CONSTRUCTION (benchmarks are
    * thousands of docs, the corpus is billions), so its distinct shingle
    * hashes broadcast and the corpus never shuffles — one corpus scan, a
    * broadcast semi-ish join on the exploded shingles, then a partial-agg
    * groupBy on doc_id. The eval branch is a second, separately-FILTERED
    * scan of the same table: its predicate pushes into the parquet reader
    * (row-group pruning), which beats caching corpus-sized shingles just
    * to carve out the tiny eval side. Cross-engine md5 hashes as
    * everywhere.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    def shingles(df: DataFrame) = df
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 5)
      .select(col("doc_id"), explode(
        graft.functions.ShingleHashes.shingle_hashes(col("words"), 5, distinct = true)).as("sh"))
    val docs = Tables(spark, dir, "documents")
    val eval5 = shingles(docs.filter(col("doc_id") < 10)).select("sh").distinct()
    shingles(docs.filter(col("doc_id") >= 10))
      .join(broadcast(eval5), Seq("sh"))
      .groupBy("doc_id")
      .agg(countDistinct(col("sh")).as("n_shared"))
      .orderBy("doc_id")
  }

  val decontaminateSql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 3),
      |      i -> CAST(('0x' || substr(md5(array_to_string(string_split(text, ' ')[i:i+4], ' ')), 1, 15)) AS BIGINT)))) AS sh
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 10)
      |SELECT s.doc_id, COUNT(DISTINCT s.sh) AS n_shared
      |FROM sh s JOIN ev ON s.sh = ev.sh
      |WHERE s.doc_id >= 10
      |GROUP BY s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** Deterministic stratified sample — k docs per language, selected by
    * hash rank (training-mix construction: equal per-stratum quotas from
    * a skewed corpus). The hash rank makes the sample a pure function of
    * the data: re-runs, engines, and partitionings agree, and growing the
    * corpus only displaces rows at the quota boundary. One shuffle on the
    * stratum key; k bounds per-group state in the rank window.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 25
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("rnd"), col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        md5(concat(lit("sample:"), col("doc_id").cast("string"))).as("rnd"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("doc_id"))
      .orderBy("lang", "rank")
  }

  val sampleStratifiedSql: String =
    """SELECT lang, rank, doc_id FROM (
      |  SELECT doc_id, lang,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR)), doc_id) AS rank
      |  FROM documents)
      |WHERE rank <= 25
      |ORDER BY lang, rank""".stripMargin

  /** PII detection + redaction — count and mask emails, IPv4 addresses,
    * and phone numbers (the scrub every released training corpus runs).
    * One narrow regex projection, scan-bound; the output carries counts
    * and a fingerprint of the redacted text (not the text itself) so the
    * result row stays small at any document size.
    *
    * The synthetic corpus contains no PII, so the query deterministically
    * plants one email/IP/phone on every 7th doc_id BEFORE redacting —
    * a pure function of doc_id replayed identically by the oracle, so the
    * redaction machinery (not just a zero-match pass) is what's verified.
    * Patterns are kept in the Java∩RE2 common subset (no backrefs or
    * lookaround) so Spark and DuckDB agree byte-for-byte.
    */
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val phoneRe = "\\+\\d{1,2}-\\d{3}-\\d{4}"

  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables(spark, dir, "documents")
      .withColumn("t", when(col("doc_id") % 7 === 0,
        concat(col("text"),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com from 10."), (col("doc_id") % 200).cast("string"),
          lit(".0.1 call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text")))
    planted.select(col("doc_id"),
        regexp_count(col("t"), lit(emailRe)).cast("int").as("n_emails"),
        regexp_count(col("t"), lit(ipRe)).cast("int").as("n_ips"),
        regexp_count(col("t"), lit(phoneRe)).cast("int").as("n_phones"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("t"),
          emailRe, "<EMAIL>"), ipRe, "<IP>"), phoneRe, "<PHONE>"))
          .as("redacted_fp"))
      .orderBy("doc_id")
  }

  val piiRedactSql: String =
    s"""WITH p AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN
      |      text || ' contact user' || CAST(doc_id AS VARCHAR)
      |        || '@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR)
      |        || '.0.1 call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |    ELSE text END AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '$emailRe')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '$ipRe')) AS INT) AS n_ips,
      |  CAST(len(regexp_extract_all(t, '$phoneRe')) AS INT) AS n_phones,
      |  md5(regexp_replace(regexp_replace(regexp_replace(t,
      |    '$emailRe', '<EMAIL>', 'g'), '$ipRe', '<IP>', 'g'),
      |    '$phoneRe', '<PHONE>', 'g')) AS redacted_fp
      |FROM p
      |ORDER BY doc_id""".stripMargin

  /** Deterministic global shuffle + shard assignment — the training-order
    * op: every epoch reader needs the corpus in a reproducible pseudo-
    * random order, split into S shards (one per reader). Seeded hash key
    * ⇒ a pure function of the data (re-runs, engines, partitionings
    * agree), and there is NO global sort: one hash-shuffle on `shard`
    * and a per-shard rank window — at 100 TB that is S independent
    * partition sorts (each spillable) instead of a total-order
    * range-exchange of the corpus. Same first-15-hex-chars → bigint
    * bridge as the minhash pipeline, exact in both engines.
    */
  def shuffleShard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shards = 8
    val w = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        md5(concat(lit("shuf:42:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("shard",
        expr(s"cast(conv(substring(k, 1, 15), 16, 10) AS bigint) % $shards")
          .cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  val shuffleShardSql: String =
    """WITH k AS (
      |  SELECT doc_id, md5('shuf:42:' || CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, k,
      |    CAST(CAST(('0x' || substr(k, 1, 15)) AS BIGINT) % 8 AS INT) AS shard
      |  FROM k)
      |SELECT doc_id, shard,
      |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
      |FROM s
      |ORDER BY shard, pos""".stripMargin

  /** Data-mixture rebalancing — the pretraining "source mix" op: given
    * per-source token totals, cap every source at the MEDIAN source's
    * token count (downsample the over-represented web crawl, keep the
    * small curated sources whole) and report the per-source sampling
    * rate and resulting token budget. Two tiny aggregations: a map-side-
    * partial per-source rollup (|sources| rows), then the median as a
    * broadcast scalar — the corpus is scanned once, and at 100 TB the
    * expensive half (per-doc token counts) is the same narrow projection
    * the text-stats tier already pays.
    */
  /** Persisted per-source (n_docs, n_tokens) rollup — shared by
    * [[sourceMix]] and [[sourceTemperature]], each of which reads it
    * from cache twice (scalar + final projection). One tokenization
    * definition, one corpus scan.
    */
  private def perSourceRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("source"), size(split(col("text"), " ")).as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** The DuckDB dual of [[perSourceRollup]], shared by both oracles. */
  private val perSourceCte: String =
    """per_source AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents
      |  GROUP BY source)""".stripMargin

  def sourceMix(spark: SparkSession, dir: String): DataFrame = {
    val perSource = perSourceRollup(spark, dir)
    val cap = perSource.agg(expr("percentile(n_tokens, 0.5)").as("cap"))
    perSource.crossJoin(broadcast(cap))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(least(lit(1.0), col("cap") / col("n_tokens")), 6).as("sample_rate"),
        round(least(col("cap"), col("n_tokens").cast("double")))
          .cast("long").as("token_budget"))
      .orderBy("source")
  }

  // perSourceCte is pre-stripped — concatenate, never re-stripMargin
  val sourceMixSql: String =
    s"WITH $perSourceCte,\n" +
    """cap AS (SELECT quantile_cont(n_tokens, 0.5) AS cap FROM per_source)
      |SELECT source, n_docs, n_tokens,
      |  ROUND(LEAST(1.0, cap / n_tokens), 6) AS sample_rate,
      |  CAST(ROUND(LEAST(cap, CAST(n_tokens AS DOUBLE))) AS BIGINT) AS token_budget
      |FROM per_source CROSS JOIN cap
      |ORDER BY source""".stripMargin

  /** Temperature-scaled source mixing (the exponential-smoothing
    * reweighting multilingual/multi-corpus training uses — XLM-R-style
    * qₛ ∝ pₛ^α): small sources are up-weighted, dominant ones damped,
    * with α=0.5 here. Emits the mixing table a trainer consumes: raw
    * share p, smoothed share q, and the boost q/p each source's
    * sampling rate gets multiplied by. Complements [[sourceMix]]'s
    * hard median cap with the published soft form.
    *
    * Same shape as sourceMix: one corpus scan into a persisted
    * |sources|-row rollup; the two scalars (token total, weight
    * normalizer) broadcast back as 1-row cross joins. Float contract:
    * p and the α-power are rounded at 6dp, weights sum as
    * DECIMAL(18,6) (order-free), and every division happens on already-
    * rounded doubles — both engines run the identical IEEE tree.
    */
  def sourceTemperature(spark: SparkSession, dir: String): DataFrame =
    sourceTemperatureFrom(perSourceRollup(spark, dir))

  /** The reweighting over any (source, n_docs, n_tokens) rollup —
    * TextPipelineSpec drives it with a crafted sub-rounding source to
    * pin the NULL-boost contract the fixture corpus can't reach.
    */
  private[ext] def sourceTemperatureFrom(perSource: DataFrame): DataFrame = {
    val alpha = 0.5
    val tot = perSource.agg(sum(col("n_tokens")).as("tot"))
    val withW = perSource.crossJoin(broadcast(tot))
      .withColumn("p", round(col("n_tokens") / col("tot"), 6))
      .withColumn("w", round(pow(col("p"), alpha), 6).cast("decimal(18,6)"))
    val wsum = withW.agg(sum(col("w")).as("wsum"))
    withW.crossJoin(broadcast(wsum))
      .withColumn("q", round(col("w").cast("double") / col("wsum").cast("double"), 6))
      // a source below 5e-7 token share rounds to p = 0: its boost is
      // explicitly NULL in BOTH engines (Spark's 0-divisor NULL vs
      // DuckDB's IEEE NaN/Inf would otherwise diverge); q still ranks it
      .withColumn("boost",
        when(col("p") > 0, round(col("q") / col("p"), 6)))
      .select("source", "n_docs", "n_tokens", "p", "q", "boost")
      .orderBy("source")
  }

  val sourceTemperatureSql: String =
    s"WITH $perSourceCte,\n" +
    """tot AS (SELECT SUM(n_tokens) AS tot FROM per_source),
      |wp AS (
      |  SELECT source, n_docs, n_tokens,
      |    ROUND(n_tokens / tot, 6) AS p,
      |    CAST(ROUND(POWER(ROUND(n_tokens / tot, 6), 0.5), 6) AS DECIMAL(18,6)) AS w
      |  FROM per_source CROSS JOIN tot),
      |ws AS (SELECT SUM(w) AS wsum FROM wp)
      |SELECT source, n_docs, n_tokens, p,
      |  ROUND(CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE), 6) AS q,
      |  CASE WHEN p > 0 THEN
      |    ROUND(ROUND(CAST(w AS DOUBLE) / CAST(wsum AS DOUBLE), 6) / p, 6)
      |  END AS boost
      |FROM wp CROSS JOIN ws
      |ORDER BY source""".stripMargin

  /** k-anonymity audit over quasi-identifier cohorts — the privacy check
    * run BEFORE a sanitized export ships (Sweeney, IJUFKS 2002): every
    * (nationkey, mktsegment) cohort must contain ≥ k individuals, or the
    * combination re-identifies its members even with names faked. Emits
    * every cohort with its size and flag (the audit artifact), smallest
    * first so the violations lead. One hash-shuffle aggregation at any
    * scale — the same shape as A1 COUNT; the quasi-identifier list is
    * config in production, columns here.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    Tables(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cohort_n"))
      .withColumn("k_anonymous", col("cohort_n") >= k)
      .orderBy("cohort_n", "c_nationkey", "c_mktsegment")
  }

  val kAnonymitySql: String =
    """SELECT c_nationkey, c_mktsegment, COUNT(*) AS cohort_n,
      |  COUNT(*) >= 5 AS k_anonymous
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment
      |ORDER BY cohort_n, c_nationkey, c_mktsegment""".stripMargin

  /** l-diversity audit — [[kAnonymity]]'s stronger sibling (Machanavajjhala
    * et al., ICDE 2006): a cohort can be k-anonymous yet still leak if
    * every member shares the same SENSITIVE value (the homogeneity
    * attack — "all 12 people in that cohort have the same balance
    * band"). Each quasi-identifier cohort must contain ≥ l DISTINCT
    * sensitive values; sensitive here is the account-balance band
    * (floor(acctbal/1000) — the same IEEE double op in both engines).
    * One hash aggregation with a distinct count — the k-anonymity
    * shape plus one distinct; violations lead the output.
    */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val l = 3
    Tables(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("cohort_n"),
        countDistinct("bal_band").as("l_distinct"))
      .withColumn("l_diverse", col("l_distinct") >= l)
      .orderBy("l_distinct", "c_nationkey", "c_mktsegment")
  }

  val lDiversitySql: String =
    """SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cohort_n,
      |  CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT))
      |    AS BIGINT) AS l_distinct,
      |  COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) >= 3
      |    AS l_diverse
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment
      |ORDER BY l_distinct, c_nationkey, c_mktsegment""".stripMargin

  /** t-closeness audit — the third rung of the privacy ladder after
    * [[kAnonymity]] and [[lDiversity]] (Li, Li & Venkatasubramanian,
    * ICDE 2007): a cohort can be k-anonymous AND l-diverse yet still
    * leak if its sensitive-value DISTRIBUTION differs sharply from the
    * global one (the skewness attack — "that cohort is 90% top-band
    * balances vs 10% globally"). For the ordered sensitive attribute
    * (the same balance band as l-diversity) the distance is the Earth
    * Mover's Distance with unit ground distances, which collapses to
    * the mean absolute CUMULATIVE gap: EMD = Σᵢ|Σ_{j≤i}(p_j−q_j)| /
    * (m−1) over the m bands. EXACT integer discipline: p_j−q_j scaled
    * by cohort_n·N gives D_i = Σ_{j≤i}(cnt_j·N − gb_j·cohort_n) on
    * DECIMAL(38)/HUGEINT; the final EMD comes out via the micros
    * `div` idiom, truncating identically in both engines.
    *
    * Scale: one corpus aggregation to (cohort × band) cells; cohorts
    * (nation × segment) and balance bands are both value-grid-bounded,
    * so the completed grid, the band-ordered cumulative window
    * (PARTITIONED by cohort), and the broadcast global-band side are
    * all bounded whatever the corpus size.
    */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tPpm = 200000L // t = 0.20
    val cust = Tables(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(FLOOR(c_acctbal / 1000) AS BIGINT)").as("band"))
    // cohort × band cells feed three bounded rollups; persisted so the
    // customer scan happens once (the skew_report discipline)
    val cells = cust
      .groupBy("c_nationkey", "c_mktsegment", "band")
      .agg(count(lit(1)).cast("decimal(38,0)").as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cells.count()
    val bands = cells.groupBy("band").agg(sum("cnt").as("gb"))
    val tot = bands.agg(count(lit(1)).cast("decimal(38,0)").as("m"),
      sum("gb").as("nn"))
    val cohorts = cells.groupBy("c_nationkey", "c_mktsegment")
      .agg(sum("cnt").as("cohort_n"))
    val grid = cohorts.crossJoin(broadcast(bands))
      .join(cells, Seq("c_nationkey", "c_mktsegment", "band"), "left")
      .withColumn("cnt",
        coalesce(col("cnt"), lit(0).cast("decimal(38,0)")))
    val w = Window.partitionBy("c_nationkey", "c_mktsegment")
      .orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(broadcast(tot))
      .withColumn("d",
        sum(col("cnt") * col("nn") - col("gb") * col("cohort_n")).over(w))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("cohort_n"),
        col("m"), col("nn"))
      .agg(sum(abs(col("d"))).as("sad"))
      .withColumn("emd_ppm",
        expr("sad * 1000000 div ((m - 1) * cohort_n * nn)"))
      .select(col("c_nationkey"), col("c_mktsegment"),
        col("cohort_n").cast("long").as("cohort_n"),
        (col("emd_ppm") / 1e6).as("emd"),
        (col("emd_ppm") <= tPpm).as("t_close"))
      .orderBy(desc("emd"), asc("c_nationkey"), asc("c_mktsegment"))
  }

  val tClosenessSql: String =
    """WITH cust AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
      |  FROM customer),
      |cells AS (
      |  SELECT c_nationkey, c_mktsegment, band,
      |    CAST(COUNT(*) AS HUGEINT) AS cnt
      |  FROM cust GROUP BY 1, 2, 3),
      |bands AS (SELECT band, SUM(cnt) AS gb FROM cells GROUP BY 1),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS m, SUM(gb) AS nn FROM bands),
      |coh AS (
      |  SELECT c_nationkey, c_mktsegment, SUM(cnt) AS cohort_n
      |  FROM cells GROUP BY 1, 2),
      |grid AS (
      |  SELECT coh.c_nationkey, coh.c_mktsegment, coh.cohort_n,
      |    b.band, b.gb, COALESCE(cells.cnt, 0) AS cnt
      |  FROM coh CROSS JOIN bands b
      |  LEFT JOIN cells ON cells.c_nationkey = coh.c_nationkey
      |    AND cells.c_mktsegment = coh.c_mktsegment
      |    AND cells.band = b.band),
      |d AS (
      |  SELECT c_nationkey, c_mktsegment, cohort_n, m, nn,
      |    SUM(cnt * nn - gb * cohort_n) OVER (
      |      PARTITION BY c_nationkey, c_mktsegment ORDER BY band
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dd
      |  FROM grid CROSS JOIN tot),
      |s AS (
      |  SELECT c_nationkey, c_mktsegment, cohort_n, m, nn,
      |    SUM(ABS(dd)) AS sad
      |  FROM d GROUP BY 1, 2, 3, 4, 5)
      |SELECT c_nationkey, c_mktsegment,
      |  CAST(cohort_n AS BIGINT) AS cohort_n,
      |  CAST(sad * 1000000 // ((m - 1) * cohort_n * nn) AS BIGINT) / 1e6
      |    AS emd,
      |  sad * 1000000 // ((m - 1) * cohort_n * nn) <= 200000 AS t_close
      |FROM s
      |ORDER BY emd DESC, c_nationkey, c_mktsegment""".stripMargin

  /** Key-skew diagnosis — the measurement that decides whether
    * [[Skew.saltedJoin]]/[[Skew.saltedAgg]] are needed at all: the
    * heaviest keys with their share of the table, plus the global
    * max/avg frequency ratio (1.0 = perfectly uniform; the celebrity
    * key the salting ops exist for shows up as a large ratio). One
    * hash-shuffle count, two broadcast scalars — the report itself
    * never becomes the skew problem it measures.
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    // persisted: the key-count rollup feeds BOTH the report rows and the
    // stats scalars — un-persisted, Catalyst plans the scan+shuffle twice
    // (PlanAuditSpec pins 1 scan); Bench/Verify release via clearCache
    val counts = Tables(spark, dir, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    counts.count()
    val stats = counts.agg(sum("n").cast("double").as("total"),
      count(lit(1)).as("n_keys"), max("n").as("max_n"))
    counts.crossJoin(broadcast(stats)) // 1-row scalar side
      .withColumn("share", round(col("n") / col("total"), 6))
      .withColumn("max_avg_ratio",
        round(col("max_n") * col("n_keys") / col("total"), 4))
      .orderBy(desc("n"), asc("user_id")).limit(10)
      .select(col("user_id"), col("n"), col("share"), col("max_avg_ratio"))
  }

  val skewReportSql: String =
    """WITH counts AS (
      |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
      |s AS (
      |  SELECT CAST(SUM(n) AS DOUBLE) AS total, COUNT(*) AS n_keys,
      |    MAX(n) AS max_n
      |  FROM counts)
      |SELECT user_id, n,
      |  ROUND(n / total, 6) AS share,
      |  ROUND(max_n * n_keys / total, 4) AS max_avg_ratio
      |FROM counts, s
      |ORDER BY n DESC, user_id
      |LIMIT 10""".stripMargin

  /** Quality-WEIGHTED deterministic sampling — keep each document with
    * probability equal to its quality score, but as a pure function of
    * the data: the per-doc uniform draw is a hash of the doc_id (60 hex
    * bits / 2⁶⁰), so re-runs, engines, and partitionings produce the
    * SAME sample, and the expected mixture up-weights high-quality text
    * exactly as a soft curation curriculum does (the stochastic sibling
    * of [[corpusCuration]]'s hard threshold). All rows are emitted with
    * the `kept` verdict so the gate hashes the complete decision, not
    * just the survivor set.
    */
  def sampleQualityWeighted(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .select(col("doc_id"), TextQueries.qualityScore.as("q"))
      .withColumn("u", round(expr(
        """cast(conv(substring(md5(concat('qw:', cast(doc_id AS string))), 1, 15), 16, 10) AS double)
           / 1152921504606846976.0""").cast("double"), 6))
      .select(col("doc_id"), col("q").as("quality_score"), col("u"),
        (col("u") < col("q")).as("kept"))
      .orderBy("doc_id")
  }

  val sampleQualityWeightedSql: String =
    s"""SELECT doc_id, q AS quality_score, u, u < q AS kept
      |FROM (
      |  SELECT doc_id, ${TextQueries.qualityScoreSql} AS q,
      |    ROUND(CAST(('0x' || substr(md5('qw:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      |      / 1152921504606846976.0, 6) AS u
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Weighted sampling WITHOUT replacement, exact-k — Efraimidis &
    * Spirakis 2006 (IPL 97(5), the A-ES scheme): each item draws an
    * exponential race clock `−ln(u)/w` and the k smallest clocks win,
    * which provably samples k items without replacement with
    * probability proportional to weight. The distributed form is ONE
    * scan + TakeOrdered (the clock is a pure projection; no global
    * sort, no sequential reservoir — the classic single-machine
    * reservoir algorithm serializes on state, A-ES is
    * embarrassingly parallel and is what you run at 100 TB).
    * Complements [[sampleQualityWeighted]] (Bernoulli, random SIZE) by
    * returning an EXACT sample size with the same weight semantics.
    *
    * Determinism: `u` is the doc_id-hash uniform over (0, 2⁶⁰] — the
    * +1 happens in BIGINT and ONE int→double conversion follows, so
    * both engines divide identical doubles — and the clock is rounded
    * at 6 dp (the ln discipline) with the doc_id tiebreak, so the
    * top-50 cut is reproducible across engines, runs, and partitionings
    * (weights floored at 0.05 to keep zero-quality docs drawable and
    * the division finite).
    */
  def sampleWeightedAes(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .select(col("doc_id"), TextQueries.qualityScore.as("q"))
      .withColumn("aes_key", round(expr(
        """-ln(cast(cast(conv(substring(md5(concat('aes:', cast(doc_id AS string))), 1, 15), 16, 10) AS bigint) + 1 AS double)
           |  / cast(1152921504606846976 AS double))
           |/ greatest(q, cast(0.05 AS double))""".stripMargin), 6))
      .select(col("doc_id"), col("q").as("quality_score"), col("aes_key"))
      .orderBy(asc("aes_key"), asc("doc_id")).limit(50)
  }

  val sampleWeightedAesSql: String =
    s"""SELECT doc_id, q AS quality_score,
      |  ROUND(-LN(CAST(CAST(('0x' || substr(md5('aes:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1 AS DOUBLE)
      |      / CAST(1152921504606846976 AS DOUBLE))
      |    / GREATEST(q, CAST(0.05 AS DOUBLE)), 6) AS aes_key
      |FROM (SELECT doc_id, ${TextQueries.qualityScoreSql} AS q FROM documents)
      |ORDER BY aes_key, doc_id LIMIT 50""".stripMargin

  /** Population-stability-index drift monitor over `events.value` — the
    * distribution check a recurring 100 TB ingest runs before promoting
    * a new batch: the corpus is split into a reference window (first
    * half of the date span) and a current window, `value` is range-
    * binned into 10 fixed-width bins, and each bin reports its PSI term
    * `(p − q)·ln(p/q)` with proportions floored at 10⁻⁶ (the standard
    * empty-bin guard). Σterms < 0.1 is the usual "no drift" reading;
    * emitting per-bin terms (not just the total) is what makes the
    * report actionable — the offending bins are visible.
    *
    * Scale shape: one scalar-bounds agg broadcast, then ONE conditional
    * aggregation over a pure binning projection (10 output rows); the
    * proportion window runs on the 10-row aggregate, never the corpus.
    * Determinism: binning and proportions are integer-or-single-IEEE-op
    * arithmetic; `ln` is the one libm call, rounded to 6 dp — the same
    * discipline as the BM25/TF-IDF oracles.
    */
  def driftPsi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(to_date(col("ts")).as("d"), col("value"))
    val bounds = ev.agg(min("d").as("mind"), max("d").as("maxd"),
      min("value").as("minv"), max("value").as("maxv"))
    val binned = ev.crossJoin(broadcast(bounds))
      .withColumn("is_ref",
        datediff(col("d"), col("mind")) * 2 < datediff(col("maxd"), col("mind")))
      .withColumn("bin",
        least(floor((col("value") - col("minv")) * lit(10.0)
          / (col("maxv") - col("minv"))), lit(9L)).cast("long"))
    val counts = binned.groupBy("bin").agg(
      count(when(col("is_ref"), lit(1))).as("n_ref"),
      count(when(!col("is_ref"), lit(1))).as("n_cur"))
    val w = Window.partitionBy()
    counts
      .withColumn("p", greatest(col("n_ref") / sum("n_ref").over(w), lit(1e-6)))
      .withColumn("q", greatest(col("n_cur") / sum("n_cur").over(w), lit(1e-6)))
      .withColumn("psi_term", round((col("p") - col("q")) * log(col("p") / col("q")), 6))
      .select(col("bin"), col("n_ref"), col("n_cur"), col("psi_term"))
  }

  /** TIME-SERIES form of [[driftPsi]]: PSI of each day's value
    * distribution against the PREVIOUS OBSERVED day — the monitoring
    * query a production ingest runs continuously, where the static
    * form is the one-shot audit. The (day × bin) grid is DENSIFIED
    * (explode of bins 0–9 against the distinct days) so a bin that
    * empties out hits the 1e-6 floor instead of silently vanishing
    * from the comparison, and "previous day" is a lag window per bin —
    * calendar gaps compare against the last day that actually has
    * data. Per-day PSI sums the 6dp-rounded terms as exact decimal.
    *
    * Scale: ONE corpus aggregate to (day, bin) counts; everything
    * after — grid, lag, rollup — runs on calendar-bounded rows.
    */
  def driftPsiDaily(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(to_date(col("ts")).as("d"), col("value"))
    val bounds = ev.agg(min("value").as("minv"), max("value").as("maxv"))
    // persisted: the calendar-bounded (day, bin) rollup feeds the grid's
    // distinct-days side AND the dense left join — uncached, the corpus
    // bin pass plans twice (PlanAuditSpec pins 2 scans total)
    val daily = ev.crossJoin(broadcast(bounds))
      .withColumn("bin",
        least(floor((col("value") - col("minv")) * lit(10.0)
          / (col("maxv") - col("minv"))), lit(9L)).cast("long"))
      .groupBy("d", "bin").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = daily.select("d").distinct()
      .crossJoin(broadcast(
        spark.range(0, 10).select(col("id").as("bin"))))
    val dense = grid.join(daily, Seq("d", "bin"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("p", greatest(
        col("n") / sum("n").over(Window.partitionBy("d")), lit(1e-6)))
    val lagged = dense.withColumn("p_prev",
      lag("p", 1).over(Window.partitionBy("bin").orderBy("d")))
    lagged.filter(col("p_prev").isNotNull)
      .withColumn("term", round((col("p") - col("p_prev"))
        * log(col("p") / col("p_prev")), 6).cast("decimal(18,6)"))
      .groupBy("d").agg(
        sum("term").cast("double").as("psi"),
        sum("n").as("n_events"))
      .select(col("d"), col("psi"), col("n_events"),
        (col("psi") > 0.2).as("alert"))
      .orderBy("d")
  }

  val driftPsiDailySql: String =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS d, value FROM events
      |  WHERE value IS NOT NULL),
      |bounds AS (SELECT MIN(value) AS minv, MAX(value) AS maxv FROM ev),
      |daily AS (
      |  SELECT d,
      |    CAST(LEAST(FLOOR((value - minv) * 10.0 / (maxv - minv)), 9)
      |      AS BIGINT) AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM ev CROSS JOIN bounds
      |  GROUP BY 1, 2),
      |grid AS (
      |  SELECT d, bin FROM (SELECT DISTINCT d FROM daily)
      |  CROSS JOIN (SELECT unnest(range(0, 10)) AS bin)),
      |dense AS (
      |  SELECT g.d, g.bin, COALESCE(daily.n, 0) AS n,
      |    GREATEST(COALESCE(daily.n, 0)
      |      / SUM(COALESCE(daily.n, 0)) OVER (PARTITION BY g.d), 1e-6) AS p
      |  FROM grid g LEFT JOIN daily ON daily.d = g.d AND daily.bin = g.bin),
      |lagged AS (
      |  SELECT d, n, p,
      |    LAG(p) OVER (PARTITION BY bin ORDER BY d) AS p_prev
      |  FROM dense)
      |SELECT d,
      |  CAST(SUM(CAST(ROUND((p - p_prev) * LN(p / p_prev), 6)
      |    AS DECIMAL(18,6))) AS DOUBLE) AS psi,
      |  CAST(SUM(n) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(ROUND((p - p_prev) * LN(p / p_prev), 6)
      |    AS DECIMAL(18,6))) AS DOUBLE) > 0.2 AS alert
      |FROM lagged
      |WHERE p_prev IS NOT NULL
      |GROUP BY d
      |ORDER BY d""".stripMargin

  val driftPsiSql: String =
    """WITH ev AS (SELECT CAST(ts AS DATE) AS d, value FROM events WHERE value IS NOT NULL),
      |b AS (SELECT MIN(d) AS mind, MAX(d) AS maxd, MIN(value) AS minv, MAX(value) AS maxv
      |      FROM ev),
      |s AS (SELECT (d - mind) * 2 < (maxd - mind) AS is_ref,
      |        CAST(LEAST(FLOOR((value - minv) * 10.0 / (maxv - minv)), 9) AS BIGINT) AS bin
      |      FROM ev CROSS JOIN b),
      |c AS (SELECT bin,
      |        COUNT(*) FILTER (WHERE is_ref) AS n_ref,
      |        COUNT(*) FILTER (WHERE NOT is_ref) AS n_cur
      |      FROM s GROUP BY bin),
      |t AS (SELECT bin, n_ref, n_cur,
      |        GREATEST(n_ref / SUM(n_ref) OVER (), 1e-6) AS p,
      |        GREATEST(n_cur / SUM(n_cur) OVER (), 1e-6) AS q
      |      FROM c)
      |SELECT bin, n_ref, n_cur, ROUND((p - q) * LN(p / q), 6) AS psi_term FROM t""".stripMargin

  private val DsirBuckets = 1024
  private val DsirTopK = 100

  /** DSIR — Data Selection via Importance Resampling (Xie et al.,
    * arXiv:2302.03169): score every raw document by how much more
    * likely its hashed-n-gram features are under a TARGET (in-domain)
    * bag-of-features model than under the RAW-corpus model, and keep
    * the top-K. Features are unigrams + word bigrams hashed into
    * [[DsirBuckets]] buckets (the paper's feature hashing — the model
    * stays B-bounded at ANY corpus size); both models are
    * Laplace-smoothed bucket frequencies; a document's score is its
    * mean per-feature log importance ratio
    * `ln(p_target(b)/p_raw(b))`. Target slice = `lang = 'en'` (the
    * [[TextQueries]] lm_perplexity in-domain proxy).
    *
    * Shapes for 100 TB: pass 1 scans the corpus once and aggregates
    * to B rows (both models in the same aggregate via a conditional
    * count — the target model costs no second scan because the target
    * is a slice of the corpus; an external target corpus would be its
    * own cheap scan); pass 2 re-scans, reduces each doc to its
    * (bucket, count) profile, joins the BROADCAST λ table, and sums
    * exactly. Selection is TakeOrdered top-K, never a global sort.
    *
    * Float contract: each bucket's λ is one `ln` on a
    * deterministically-computed double ratio, rounded at 6dp into
    * DECIMAL(18,6) (the drift_psi / lm_perplexity ln discipline); the
    * per-doc sum Σ k_b·λ_b is then EXACT decimal arithmetic — order-
    * free, partitioning-independent — and only the final mean divides
    * on doubles.
    */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.Md5Prefix60.register(spark)
    val feats = Tables(spark, dir, "documents")
      .withColumn("ws", expr("filter(split(lower(text), ' +'), w -> w != '')"))
      .select(col("doc_id"), col("lang"), explode(expr(
        s"""transform(
           |  concat(ws, CASE WHEN size(ws) >= 2
           |    THEN transform(sequence(0, size(ws) - 2),
           |                   i -> concat(ws[i], ' ', ws[i + 1]))
           |    ELSE array() END),
           |  f -> md5h60(f) % $DsirBuckets)""".stripMargin)).as("b"))
    // persisted: the B-row model feeds BOTH the totals scalar and the
    // λ table — without the cache the corpus model pass plans twice
    // (PlanAuditSpec pins dsir_select at 2 scans)
    val model = feats.groupBy("b").agg(
      count(lit(1)).as("cr"),
      count(when(col("lang") === "en", 1)).as("ct"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // totals reduce the B-row model, never the corpus
    val tot = model.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    val lam = model.crossJoin(broadcast(tot))
      .select(col("b"), round(log(
        ((col("ct") + 1).cast("double") * (col("nr") + DsirBuckets).cast("double"))
          / ((col("nt") + DsirBuckets).cast("double") * (col("cr") + 1).cast("double"))), 6)
        .cast("decimal(18,6)").as("lam"))
    val docProfile = feats.groupBy("doc_id", "b").agg(count(lit(1)).as("k"))
    docProfile.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("k") * col("lam")).as("s"), sum("k").as("nf"))
      .select(col("doc_id"), col("nf").cast("long").as("n_feats"),
        // signed exact integer-micros rounding of Σk·λ / nf (the
        // qualityClassifier tie discipline — the decimal sum is already
        // micros-exact, the mean must not round a double quotient)
        expr("""CASE WHEN s >= 0
                THEN (2 * cast(s * 1000000 AS bigint) + nf) div (2 * nf)
                ELSE -((2 * cast(-s * 1000000 AS bigint) + nf) div (2 * nf))
                END / 1e6""").as("dsir_score"))
      .orderBy(desc("dsir_score"), asc("doc_id")).limit(DsirTopK)
  }

  val dsirSelectSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split(lower(text), ' '), x -> x != '') AS ws
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, lang,
       |    unnest(ws || list_transform(range(1, len(ws)),
       |      i -> ws[i] || ' ' || ws[i + 1])) AS ft
       |  FROM d),
       |h AS (
       |  SELECT doc_id, lang,
       |    CAST(('0x' || substr(md5(ft), 1, 15)) AS BIGINT) % $DsirBuckets AS b
       |  FROM f),
       |model AS (
       |  SELECT b, CAST(COUNT(*) AS BIGINT) AS cr,
       |    CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ct
       |  FROM h GROUP BY b),
       |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr,
       |               CAST(SUM(ct) AS BIGINT) AS nt FROM model),
       |lam AS (
       |  SELECT b, CAST(ROUND(LN(
       |      (CAST(ct + 1 AS DOUBLE) * CAST(nr + $DsirBuckets AS DOUBLE))
       |      / (CAST(nt + $DsirBuckets AS DOUBLE) * CAST(cr + 1 AS DOUBLE))), 6)
       |    AS DECIMAL(18,6)) AS lam
       |  FROM model CROSS JOIN tot),
       |profile AS (
       |  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS k
       |  FROM h GROUP BY doc_id, b),
       |score AS (
       |  SELECT doc_id, SUM(k * lam) AS s, CAST(SUM(k) AS BIGINT) AS nf
       |  FROM profile JOIN lam USING (b) GROUP BY doc_id)
       |SELECT doc_id, nf AS n_feats,
       |  CASE WHEN s >= 0
       |    THEN (2 * CAST(s * 1000000 AS BIGINT) + nf) // (2 * nf)
       |    ELSE -((2 * CAST(-s * 1000000 AS BIGINT) + nf) // (2 * nf))
       |    END / 1e6 AS dsir_score
       |FROM score
       |ORDER BY dsir_score DESC, doc_id LIMIT $DsirTopK""".stripMargin

  /** GOLDEN-RECORD survivorship — the entity-resolution step after
    * clustering: every near-dup cluster elects ONE canonical document
    * by an explicit total survivorship order (quality desc, length
    * desc, doc_id asc — the last key makes election deterministic even
    * between byte-identical twins), and every member maps to it. This
    * is the artifact downstream consumers join against to rewrite
    * references; [[corpusCuration]]'s keep/drop decision is the
    * DEGENERATE form (min-doc_id rep) — here the representative is
    * quality-chosen and the full mapping ships.
    *
    * Scale: reads the persisted [[ClusterIndex]] (the one CC fixpoint
    * per session), so the cost is one corpus-scan quality projection +
    * ONE exchange on cluster_id serving both window functions
    * (election and member count ride the same sort). Singletons never
    * enter the index; `coalesce(cluster_id, doc_id)` folds them in
    * without densifying anything.
    */
  def goldenRecord(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"), TextQueries.qualityScore.as("q"))
    val withCluster = docs
      .join(ClusterIndex.forCorpus(spark, dir), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val byCluster = Window.partitionBy("cluster_id")
    withCluster
      .withColumn("canonical_id", first("doc_id").over(
        byCluster.orderBy(desc("q"), desc("n_chars"), asc("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"),
        col("n_members"))
      .orderBy("doc_id")
  }

  val goldenRecordSql: String =
    s"""WITH RECURSIVE ${DedupQueries.ccSqlCtes},
       |q AS (
       |  SELECT doc_id, n_chars,
       |    ${TextQueries.qualityScoreSql} AS q
       |  FROM documents),
       |a AS (
       |  SELECT q.doc_id, COALESCE(c.cluster_id, q.doc_id) AS cluster_id,
       |    q.q, q.n_chars
       |  FROM q LEFT JOIN clusters c ON c.doc_id = q.doc_id),
       |r AS (
       |  SELECT doc_id, cluster_id,
       |    FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
       |      ORDER BY q DESC, n_chars DESC, doc_id) AS canonical_id,
       |    CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
       |  FROM a)
       |SELECT doc_id, cluster_id, canonical_id,
       |  doc_id = canonical_id AS is_canonical, n_members
       |FROM r
       |ORDER BY doc_id""".stripMargin

  /** PER-SOURCE QUALITY CALIBRATION: map every document's quality score
    * to its percentile WITHIN its source, and keep the top 60% of each
    * source — the cross-source comparability fix. A single global
    * threshold over-prunes sources whose scorer runs systematically low
    * (different boilerplate, different language mix) and under-prunes
    * high-scoring ones; ranking within source makes "keep the best X%"
    * mean the same thing everywhere, which is how mixed-corpus
    * pipelines actually apply quality filters before [[sourceMix]]
    * rebalances volumes.
    *
    * Scale: one corpus-scan quality projection, then ONE exchange on
    * `source` serving the percent_rank window — no global sort, no
    * unpartitioned window anywhere. Float contract: q is 6dp-rounded
    * decimal-backed, percent_rank is the exact rational (rank−1)/(n−1)
    * evaluated identically by both engines, rounded at 6dp; the keep
    * predicate compares the UNROUNDED rational against 0.4 on both
    * sides.
    */
  def qualityCalibrate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("q")
    // percent_rank recomputed from its exact integer parts (rank−1)/(n−1)
    // so the 6dp rounding and the 0.4 keep-cut are pure integer
    // arithmetic — round(double,6) ties on 2-5-smooth source sizes
    // (n−1=128) and ≥ on the double is one ulp from wrong either way.
    // r rides BIGINT: Spark's rank() is 32-bit and `2·r·10⁶` overflows
    // INT once a source holds ≥ ~1074 docs (the sf1 rehearsal hit it;
    // DuckDB's RANK() is already BIGINT, so only Spark needed the cast)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), TextQueries.qualityScore.as("q"))
      .withColumn("r", (rank().over(w) - 1).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("source")) - 1)
      .select(col("doc_id"), col("source"), col("q"),
        expr("""CASE WHEN m = 0 THEN 0.0
                ELSE (2 * r * 1000000 + m) div (2 * m) / 1e6
                END""").as("pct_in_source"),
        expr("m > 0 AND r * 5 >= m * 2").as("keep_calibrated"))
      .orderBy("doc_id")
  }

  val qualityCalibrateSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, source,
       |    ${TextQueries.qualityScoreSql} AS q
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, source, q,
       |    RANK() OVER (PARTITION BY source ORDER BY q) - 1 AS r,
       |    COUNT(*) OVER (PARTITION BY source) - 1 AS m
       |  FROM q)
       |SELECT doc_id, source, q,
       |  CASE WHEN m = 0 THEN 0.0
       |    ELSE (2 * r * 1000000 + m) // (2 * m) / 1e6 END AS pct_in_source,
       |  m > 0 AND r * 5 >= m * 2 AS keep_calibrated
       |FROM r
       |ORDER BY doc_id""".stripMargin

  /** CURATION REPORT — the rollup a pipeline owner actually reads after
    * [[corpusCuration]] runs: per (source, decision), document and
    * token counts — "how much of each source did quality drop, how much
    * did dedup drop, what survives". Reuses the session's persisted
    * [[ClusterIndex]] like every cluster consumer; the rollup itself is
    * one exchange on (source, decision) over the already-decided rows,
    * so the report rides the curation pass's cost, not its own.
    */
  def curationReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        TextQueries.qualityScore.as("q"))
    val clusters = ClusterIndex.forCorpus(spark, dir)
    docs.join(clusters, Seq("doc_id"), "left")
      .select(col("source"), col("n_tokens"),
        when(col("q") < threshold, "low_quality")
          .when(col("cluster_id").isNotNull && col("cluster_id") =!= col("doc_id"),
            "near_dup")
          .otherwise("keep").as("decision"))
      .groupBy("source", "decision")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .orderBy("source", "decision")
  }

  val curationReportSql: String =
    s"""WITH RECURSIVE ${DedupQueries.ccSqlCtes},
       |quality AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ${TextQueries.qualityScoreSql} AS q
       |  FROM documents),
       |decided AS (
       |  SELECT d.source, d.n_tokens,
       |    CASE WHEN d.q < $threshold THEN 'low_quality'
       |         WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> d.doc_id
       |           THEN 'near_dup'
       |         ELSE 'keep' END AS decision
       |  FROM quality d LEFT JOIN clusters c ON c.doc_id = d.doc_id)
       |SELECT source, decision, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
       |FROM decided
       |GROUP BY source, decision
       |ORDER BY source, decision""".stripMargin

  /** LSH PARAMETER PLANNER — the design-time dual of the MinHash
    * pipeline: for a k-hash signature, every (rows r, bands b = k/r)
    * split has collision threshold t ≈ (1/b)^(1/r) and an S-curve
    * P(candidate | sim s) = 1 − (1 − s^r)^b; the planner tabulates the
    * curve for the shipped k=8 and a production k=128 and marks the
    * split whose threshold lands closest to the 0.8 near-dup target —
    * exactly how [[DedupQueries]]' 4×2 banding was chosen. Pure bounded
    * scalar math (the index-advisor tier): ~12 rows, no corpus access
    * at any scale.
    */
  def lshParamPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ks = Seq(8, 128)
    val grid: Seq[(Int, Int)] =
      for { k <- ks; r <- Seq(1, 2, 4, 8, 16, 32, 64, 128) if k % r == 0 && r <= k }
        yield (k, r)
    def curve(s: Double) =
      round(lit(1.0) - pow(lit(1.0) - pow(lit(s), col("r")), col("b")), 6)
    val base = spark.createDataFrame(grid).toDF("k", "r")
      .select(col("k").cast("long").as("k"), col("r").cast("long").as("r"))
      .withColumn("b", (col("k") / col("r")).cast("long"))
      .withColumn("threshold", round(pow(lit(1.0) / col("b"), lit(1.0) / col("r")), 6))
    base
      .withColumn("p_at_50", curve(0.5))
      .withColumn("p_at_70", curve(0.7))
      .withColumn("p_at_90", curve(0.9))
      .withColumn("dist", abs(col("threshold") - lit(0.8)))
      .withColumn("chosen",
        col("dist") === min("dist").over(Window.partitionBy("k")))
      .drop("dist")
      .orderBy("k", "r")
  }

  val lshParamPlanSql: String =
    """WITH grid AS (
      |  SELECT CAST(k AS BIGINT) AS k, CAST(r AS BIGINT) AS r
      |  FROM (VALUES (8,1),(8,2),(8,4),(8,8),
      |               (128,1),(128,2),(128,4),(128,8),
      |               (128,16),(128,32),(128,64),(128,128)) AS t(k, r)),
      |b AS (
      |  SELECT k, r, k // r AS b,
      |    ROUND(POW(1.0 / (k // r), 1.0 / r), 6) AS threshold
      |  FROM grid),
      |c AS (
      |  SELECT k, r, b, threshold,
      |    ROUND(1.0 - POW(1.0 - POW(0.5, r), b), 6) AS p_at_50,
      |    ROUND(1.0 - POW(1.0 - POW(0.7, r), b), 6) AS p_at_70,
      |    ROUND(1.0 - POW(1.0 - POW(0.9, r), b), 6) AS p_at_90,
      |    ABS(threshold - 0.8) AS dist
      |  FROM b)
      |SELECT k, r, b, threshold, p_at_50, p_at_70, p_at_90,
      |  dist = MIN(dist) OVER (PARTITION BY k) AS chosen
      |FROM c
      |ORDER BY k, r""".stripMargin

  /** LANGUAGE-MIX REPORT with Shannon entropy per source — the balance
    * metric next to [[sourceMix]]'s volume table: a source whose
    * language entropy collapses between ingests has changed character
    * (crawler drift, upstream filter change) even if its volume
    * didn't. p·ln p terms are 6dp-rounded and summed as exact decimal
    * (the [[driftPsiDaily]] discipline); one corpus aggregate to
    * (source × lang), everything else bounded.
    */
  def sourceEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Tables(spark, dir, "documents")
      .groupBy("source", "lang").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("source")
    byLang
      .withColumn("p", col("n") / sum("n").over(w))
      .withColumn("term",
        round(-col("p") * log(col("p")), 6).cast("decimal(18,6)"))
      .groupBy("source").agg(
        sum("n").as("n_docs"),
        count(lit(1)).as("n_langs"),
        sum("term").cast("double").as("lang_entropy"))
      .orderBy("source")
  }

  val sourceEntropySql: String =
    """WITH c AS (
      |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents GROUP BY source, lang),
      |p AS (
      |  SELECT source, n,
      |    n / SUM(n) OVER (PARTITION BY source) AS p
      |  FROM c)
      |SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
      |  CAST(COUNT(*) AS BIGINT) AS n_langs,
      |  CAST(SUM(CAST(ROUND(-p * LN(p), 6) AS DECIMAL(18,6))) AS DOUBLE)
      |    AS lang_entropy
      |FROM p
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** CROSS-SOURCE OVERLAP MATRIX — which source pairs share CONTENT
    * SPANS: each source's distinct word-5-gram fingerprints (the
    * [[DedupQueries.dupSpans]] span unit, lifted to source
    * granularity) self-joined on the span hash and counted per source
    * pair. The macro contamination diagnostic in front of the
    * cross-source dedup tier: a pair sharing many spans means one
    * source mirrors or quotes another and should be down-weighted at
    * the SOURCE level, not just per-document. (Whole-document md5
    * would be the exact form, but mirrored corpora rarely share exact
    * bytes — they share passages.) One corpus scan + one span-keyed
    * exchange; join fan-out per span is bounded by |sources|.
    */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val fs = Tables(spark, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 5)
      .select(col("source"), explode(
        graft.functions.ShingleHashes.shingle_hashes(col("words"), 5, distinct = true)).as("sh"))
      .distinct()
    val a = fs.select(col("sh"), col("source").as("source_a"))
    val b = fs.select(col("sh"), col("source").as("source_b"))
    a.join(b, Seq("sh"))
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_shared_spans"))
      .orderBy(desc("n_shared_spans"), asc("source_a"), asc("source_b"))
  }

  val sourceOverlapSql: String =
    """WITH fs AS (
      |  SELECT DISTINCT source,
      |    unnest(list_distinct(list_transform(range(1, len(ws) - 3),
      |      i -> CAST(('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 15)) AS BIGINT)))) AS sh
      |  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 5)
      |SELECT a.source AS source_a, b.source AS source_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_shared_spans
      |FROM fs a JOIN fs b ON a.sh = b.sh AND a.source < b.source
      |GROUP BY a.source, b.source
      |ORDER BY n_shared_spans DESC, source_a, source_b""".stripMargin

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV drift test on `events.value` —
    * the distribution-free companion to [[driftPsi]]: PSI needs a bin
    * choice and reports WHERE mass moved; KS is binless and gives a
    * yes/no with a critical value. Reference = first half of the date
    * span (the driftPsi split). Computed EXACTLY: values quantize to
    * their cents grid (they are 2dp amounts, so ROUND(v·100) is
    * lossless and the grid is bounded by the value RANGE — ~49k rows
    * here — at any corpus size), the D statistic maximizes the integer
    * cross-product |F₁·n₂ − F₂·n₁| over the grid, and the α=0.05
    * decision compares 10⁶·D²ₙᵤₘ against 1.844164·(n₁+n₂)·n₁·n₂
    * (1.358² = 1.844164 exactly) in DECIMAL(38,0)/HUGEINT — no sqrt,
    * no float anywhere but the display divisions.
    *
    * Scale: one corpus aggregate to the cents histogram; the
    * cumulative windows run single-partition on that bounded grid
    * (range-partitioned prefix sums past ~10⁶ grid rows).
    */
  def ksDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, dir, "events")
      .filter(col("value").isNotNull)
      .select(to_date(col("ts")).as("d"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
    val bounds = ev.agg(min("d").as("mind"), max("d").as("maxd"))
    val hist = ev.crossJoin(broadcast(bounds))
      .withColumn("is_ref",
        datediff(col("d"), col("mind")) * 2 < datediff(col("maxd"), col("mind")))
      .groupBy("cents")
      .agg(count(when(col("is_ref"), lit(1))).as("c1"),
        count(when(!col("is_ref"), lit(1))).as("c2"))
    val cum = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy()
    hist
      .withColumn("f1", sum("c1").over(cum))
      .withColumn("f2", sum("c2").over(cum))
      .withColumn("n1", sum("c1").over(tot))
      .withColumn("n2", sum("c2").over(tot))
      .withColumn("dnum", abs(col("f1") * col("n2") - col("f2") * col("n1")))
      .withColumn("rk",
        row_number().over(Window.orderBy(desc("dnum"), asc("cents"))))
      .filter(col("rk") === 1)
      .select(col("n1"), col("n2"),
        (col("cents") / 100.0).as("at_value"),
        expr("""(2 * CAST(dnum AS DECIMAL(38,0)) * 1000000
                  + CAST(n1 AS DECIMAL(38,0)) * n2)
                div (2 * CAST(n1 AS DECIMAL(38,0)) * n2) / 1e6""").as("ks"),
        expr("""CAST(1000000 AS DECIMAL(38,0)) * dnum * dnum
                > CAST(1844164 AS DECIMAL(38,0)) * (n1 + n2) * n1 * n2""")
          .as("reject_05"))
  }

  val ksDriftSql: String =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      |  FROM events WHERE value IS NOT NULL),
      |b AS (SELECT MIN(d) AS mind, MAX(d) AS maxd FROM ev),
      |hist AS (
      |  SELECT cents,
      |    CAST(COUNT(CASE WHEN date_diff('day', mind, d) * 2
      |      < date_diff('day', mind, maxd) THEN 1 END) AS BIGINT) AS c1,
      |    CAST(COUNT(CASE WHEN date_diff('day', mind, d) * 2
      |      >= date_diff('day', mind, maxd) THEN 1 END) AS BIGINT) AS c2
      |  FROM ev CROSS JOIN b
      |  GROUP BY cents),
      |cumed AS (
      |  SELECT cents,
      |    CAST(SUM(c1) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS f1,
      |    CAST(SUM(c2) OVER (ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS f2,
      |    CAST(SUM(c1) OVER () AS BIGINT) AS n1,
      |    CAST(SUM(c2) OVER () AS BIGINT) AS n2
      |  FROM hist),
      |d AS (
      |  SELECT cents, n1, n2, ABS(f1 * n2 - f2 * n1) AS dnum,
      |    ROW_NUMBER() OVER (ORDER BY ABS(f1 * n2 - f2 * n1) DESC, cents)
      |      AS rk
      |  FROM cumed)
      |SELECT n1, n2, cents / 100.0 AS at_value,
      |  CAST((2 * CAST(dnum AS HUGEINT) * 1000000
      |          + CAST(n1 AS HUGEINT) * n2)
      |        // (2 * CAST(n1 AS HUGEINT) * n2) AS BIGINT) / 1e6 AS ks,
      |  CAST(1000000 AS HUGEINT) * dnum * dnum
      |    > CAST(1844164 AS HUGEINT) * (n1 + n2) * n1 * n2 AS reject_05
      |FROM d
      |WHERE rk = 1""".stripMargin

  /** POISSON-BOOTSTRAP CONFIDENCE INTERVAL for the corpus mean token
    * count — the published way to bootstrap AT SCALE (Chamandy et al.,
    * "Estimating Uncertainty for Massive Data Streams", Google 2012):
    * classical resampling needs N draws per replicate from a global
    * index (undistributable), Poisson bootstrap gives each row an
    * independent Poisson(1) replicate weight, so B=100 replicates are
    * ONE corpus scan with a bounded explode — no global state, no
    * second pass, weights a pure function of (doc_id, replicate).
    *
    * Determinism: the Poisson draw inverts the CDF on an md5-derived
    * integer-nanos uniform against INTEGER literal thresholds
    * (e⁻¹-cumulative series truncated at 6 — P(>6) < 10⁻⁴ at nano
    * resolution), replicate means use the exact half-up micros idiom
    * (zero-weight replicates guarded to 0, impossible at any real
    * corpus size), and the 95% CI is the nearest-rank 3rd/98th order
    * statistic of the 100 replicate means — everything integer until
    * the final display divisions.
    */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 100
    def x = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(lower(text), ' +'), w -> w != '')"))
          .cast("long").as("x"))
    val point = x.agg(sum("x").as("sx"), count(lit(1)).as("nx"))
    val reps = x
      .select(col("doc_id"), col("x"),
        explode(expr(s"sequence(0, ${B - 1})")).as("r"))
      .withColumn("u", expr(
        """cast(conv(substring(md5(concat(cast(doc_id AS string), ':',
          |cast(r AS string))), 1, 15), 16, 10) AS bigint)
          |% 1000000000""".stripMargin))
      .withColumn("w", expr(
        """CASE WHEN u < 367879441 THEN 0 WHEN u < 735758882 THEN 1
          |WHEN u < 919698603 THEN 2 WHEN u < 981011843 THEN 3
          |WHEN u < 996340153 THEN 4 WHEN u < 999405815 THEN 5
          |ELSE 6 END""".stripMargin))
      .groupBy("r")
      .agg(sum(col("w") * col("x")).as("swx"), sum("w").as("sw"))
      .select(col("r"), expr(
        """CASE WHEN sw = 0 THEN 0
          |ELSE (2 * swx * 1000000 + sw) div (2 * sw) END""".stripMargin)
        .as("mean_micros"))
    reps
      .withColumn("rk",
        row_number().over(Window.orderBy(col("mean_micros"), col("r"))))
      .agg(max(when(col("rk") === 3, col("mean_micros"))).as("lo_micros"),
        max(when(col("rk") === 98, col("mean_micros"))).as("hi_micros"))
      .crossJoin(broadcast(point))
      .select(col("nx").as("n_docs"), lit(B.toLong).as("b"),
        expr("(2 * sx * 1000000 + nx) div (2 * nx) / 1e6").as("mean_tokens"),
        (col("lo_micros") / 1e6).as("ci_lo"),
        (col("hi_micros") / 1e6).as("ci_hi"))
  }

  val bootstrapCiSql: String =
    """WITH x AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(lower(text), ' '),
      |      w -> w != '')) AS BIGINT) AS x
      |  FROM documents),
      |pt AS (
      |  SELECT CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(COUNT(*) AS BIGINT) AS nx
      |  FROM x),
      |draws AS (
      |  SELECT t.r AS r, x.x,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
      |      CAST(t.r AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000000 AS u
      |  FROM x CROSS JOIN range(0, 100) t(r)),
      |wtd AS (
      |  SELECT r, x,
      |    CASE WHEN u < 367879441 THEN 0 WHEN u < 735758882 THEN 1
      |    WHEN u < 919698603 THEN 2 WHEN u < 981011843 THEN 3
      |    WHEN u < 996340153 THEN 4 WHEN u < 999405815 THEN 5
      |    ELSE 6 END AS w
      |  FROM draws),
      |reps AS (
      |  SELECT r, CAST(SUM(w * x) AS BIGINT) AS swx,
      |    CAST(SUM(w) AS BIGINT) AS sw
      |  FROM wtd GROUP BY r),
      |means AS (
      |  SELECT r,
      |    CASE WHEN sw = 0 THEN 0
      |    ELSE (2 * swx * 1000000 + sw) // (2 * sw) END AS mean_micros
      |  FROM reps),
      |ranked AS (
      |  SELECT mean_micros,
      |    ROW_NUMBER() OVER (ORDER BY mean_micros, r) AS rk
      |  FROM means),
      |ci AS (
      |  SELECT CAST(MAX(CASE WHEN rk = 3 THEN mean_micros END) AS BIGINT)
      |      AS lo_micros,
      |    CAST(MAX(CASE WHEN rk = 98 THEN mean_micros END) AS BIGINT)
      |      AS hi_micros
      |  FROM ranked)
      |SELECT nx AS n_docs, CAST(100 AS BIGINT) AS b,
      |  (2 * sx * 1000000 + nx) // (2 * nx) / 1e6 AS mean_tokens,
      |  lo_micros / 1e6 AS ci_lo,
      |  hi_micros / 1e6 AS ci_hi
      |FROM ci CROSS JOIN pt""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "source_entropy" -> ((sourceEntropy _, sourceEntropySql)),
    "source_overlap" -> ((sourceOverlap _, sourceOverlapSql)),
    "dsir_select" -> ((dsirSelect _, dsirSelectSql)),
    "golden_record" -> ((goldenRecord _, goldenRecordSql)),
    "quality_calibrate" -> ((qualityCalibrate _, qualityCalibrateSql)),
    "curation_report" -> ((curationReport _, curationReportSql)),
    "lsh_param_plan" -> ((lshParamPlan _, lshParamPlanSql)),
    "drift_psi" -> ((driftPsi _, driftPsiSql)),
    "drift_psi_daily" -> ((driftPsiDaily _, driftPsiDailySql)),
    "sample_quality_weighted" -> ((sampleQualityWeighted _, sampleQualityWeightedSql)),
    "sample_weighted_aes" -> ((sampleWeightedAes _, sampleWeightedAesSql)),
    "skew_report" -> ((skewReport _, skewReportSql)),
    "k_anonymity" -> ((kAnonymity _, kAnonymitySql)),
    "l_diversity" -> ((lDiversity _, lDiversitySql)),
    "t_closeness" -> ((tCloseness _, tClosenessSql)),
    "corpus_curation" -> ((corpusCuration _, corpusCurationSql)),
    "decontaminate" -> ((decontaminate _, decontaminateSql)),
    "sample_stratified" -> ((sampleStratified _, sampleStratifiedSql)),
    "pii_redact" -> ((piiRedact _, piiRedactSql)),
    "shuffle_shard" -> ((shuffleShard _, shuffleShardSql)),
    "source_mix" -> ((sourceMix _, sourceMixSql)),
    "source_temperature" -> ((sourceTemperature _, sourceTemperatureSql)),
    "bootstrap_ci" -> ((bootstrapCi _, bootstrapCiSql)),
    "ks_drift" -> ((ksDrift _, ksDriftSql))
  )
}
