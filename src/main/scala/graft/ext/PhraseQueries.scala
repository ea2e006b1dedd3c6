package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Phrase-level corpus analysis beside [[TextQueries]]' token tier:
  * ROUGE-N overlap scoring (the summarization-eval metric repurposed as
  * an intra-source template/boilerplate readout) and RAKE keyword
  * extraction (the degree/frequency co-occurrence scorer beside
  * [[TextQueries]]' TextRank).
  *
  * Same cross-engine determinism rules as the rest of the ext tier:
  * counts and degree sums are exact integers, every ratio is a scaled
  * integer division with defined truncation (`div` / DuckDB `//`), and
  * the tokenizer is the house `split(text, ' ')` so Spark and the
  * DuckDB oracle see identical grams.
  */
object PhraseQueries {

  /** ROUGE-1/ROUGE-2 of every document against its source's EXEMPLAR
    * (lowest-doc_id) document — the clipped-count n-gram overlap
    * (Lin 2004) aggregated per source: high mean ROUGE against the
    * exemplar is the template/boilerplate signature [[TextQueries]]'
    * boilerplate_detect reads from exact line repeats, here measured
    * as a graded score. Per pair (a = exemplar as reference, b as
    * candidate): overlap = Σ_g min(cnt_a(g), cnt_b(g)), recall =
    * overlap/|grams(a)|, precision = overlap/|grams(b)| — each carried
    * as exact ppm with defined truncation, then source-averaged with
    * one more exact div.
    *
    * Scale: the exemplar table has one row per source (a bounded
    * category set — broadcast); no window, no sort anywhere. The gram
    * join is keyed (doc, gram) so each pair moves |grams| rows —
    * linear in corpus tokens; every division is per-row. No stage
    * holds more than a partition of grams regardless of corpus size.
    */
  def rougePairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val ex = docs.groupBy("source").agg(min("doc_id").as("a"))
    val pairs = docs.select(col("doc_id").as("b"), col("source"))
      .join(broadcast(ex), Seq("source"))
      .filter(col("b") =!= col("a"))
    val uni = docs.select(col("doc_id"), explode(col("ws")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val bi = docs.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(ws[i - 1], ' ', ws[i]))"))
        .as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    val tot = docs.select(col("doc_id"),
      size(col("ws")).cast("long").as("t1"),
      greatest(size(col("ws")) - 1, lit(0)).cast("long").as("t2"))
    def overlap(grams: DataFrame, out: String): DataFrame =
      pairs
        .join(grams.select(col("doc_id").as("a"), col("g"),
          col("c").as("ca")), Seq("a"))
        .join(grams.select(col("doc_id").as("b"), col("g"),
          col("c").as("cb")), Seq("b", "g"))
        .groupBy("a", "b").agg(sum(least(col("ca"), col("cb"))).as(out))
    pairs
      .join(overlap(uni, "ov1"), Seq("a", "b"), "left")
      .join(overlap(bi, "ov2"), Seq("a", "b"), "left")
      .join(tot.select(col("doc_id").as("a"), col("t1").as("t1a"),
        col("t2").as("t2a")), Seq("a"))
      .join(tot.select(col("doc_id").as("b"), col("t1").as("t1b"),
        col("t2").as("t2b")), Seq("b"))
      .select(col("source"),
        expr("coalesce(ov1, 0) * 1000000 div greatest(t1a, 1)").as("r1r"),
        expr("coalesce(ov1, 0) * 1000000 div greatest(t1b, 1)").as("r1p"),
        expr("coalesce(ov2, 0) * 1000000 div greatest(t2a, 1)").as("r2r"),
        expr("coalesce(ov2, 0) * 1000000 div greatest(t2b, 1)").as("r2p"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_pairs"), sum("r1r").as("s1r"),
        sum("r1p").as("s1p"), sum("r2r").as("s2r"), sum("r2p").as("s2p"))
      .select(col("source"), col("n_pairs"),
        (expr("s1r div n_pairs") / 1e6).as("rouge1_recall"),
        (expr("s1p div n_pairs") / 1e6).as("rouge1_precision"),
        (expr("s2r div n_pairs") / 1e6).as("rouge2_recall"),
        (expr("s2p div n_pairs") / 1e6).as("rouge2_precision"))
      .orderBy("source")
  }

  val rougePairsSql: String =
    """WITH docs AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ws
      |  FROM documents),
      |ex AS (SELECT source, MIN(doc_id) AS a FROM docs GROUP BY source),
      |pairs AS (
      |  SELECT ex.a, d.doc_id AS b, d.source
      |  FROM docs d JOIN ex USING (source)
      |  WHERE d.doc_id <> ex.a),
      |uni AS (
      |  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT doc_id, unnest(ws) AS g FROM docs) GROUP BY 1, 2),
      |bi AS (
      |  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(ws)),
      |      i -> ws[i] || ' ' || ws[i + 1])) AS g
      |    FROM docs WHERE len(ws) >= 2) GROUP BY 1, 2),
      |tot AS (
      |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS t1,
      |    CAST(GREATEST(len(ws) - 1, 0) AS BIGINT) AS t2
      |  FROM docs),
      |o1 AS (
      |  SELECT p.a, p.b, CAST(SUM(LEAST(ua.c, ub.c)) AS BIGINT) AS ov
      |  FROM pairs p
      |  JOIN uni ua ON ua.doc_id = p.a
      |  JOIN uni ub ON ub.doc_id = p.b AND ub.g = ua.g
      |  GROUP BY 1, 2),
      |o2 AS (
      |  SELECT p.a, p.b, CAST(SUM(LEAST(ba.c, bb.c)) AS BIGINT) AS ov
      |  FROM pairs p
      |  JOIN bi ba ON ba.doc_id = p.a
      |  JOIN bi bb ON bb.doc_id = p.b AND bb.g = ba.g
      |  GROUP BY 1, 2),
      |per AS (
      |  SELECT p.source,
      |    COALESCE(o1.ov, 0) * 1000000 // GREATEST(ta.t1, 1) AS r1r,
      |    COALESCE(o1.ov, 0) * 1000000 // GREATEST(tb.t1, 1) AS r1p,
      |    COALESCE(o2.ov, 0) * 1000000 // GREATEST(ta.t2, 1) AS r2r,
      |    COALESCE(o2.ov, 0) * 1000000 // GREATEST(tb.t2, 1) AS r2p
      |  FROM pairs p
      |  LEFT JOIN o1 ON o1.a = p.a AND o1.b = p.b
      |  LEFT JOIN o2 ON o2.a = p.a AND o2.b = p.b
      |  JOIN tot ta ON ta.doc_id = p.a
      |  JOIN tot tb ON tb.doc_id = p.b)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  (SUM(r1r) // COUNT(*)) / 1e6 AS rouge1_recall,
      |  (SUM(r1p) // COUNT(*)) / 1e6 AS rouge1_precision,
      |  (SUM(r2r) // COUNT(*)) / 1e6 AS rouge2_recall,
      |  (SUM(r2p) // COUNT(*)) / 1e6 AS rouge2_precision
      |FROM per GROUP BY source
      |ORDER BY source""".stripMargin

  /** RAKE keyword extraction (Rose et al. 2010) — candidate phrases are
    * maximal stopword-free token runs (≤4 words); a word scores
    * deg/freq where deg sums the lengths of every phrase occurrence
    * containing it and freq counts its phrase occurrences; a phrase
    * scores the sum of its member words' scores. Word scores are exact
    * ppm integers (deg·10⁶ div freq), phrase scores exact sums of
    * those, so the top-15 ranking (score, support, phrase tiebreak) is
    * deterministic across engines. The TF-free degree weighting is
    * what distinguishes RAKE from [[TextQueries]]' TextRank
    * (co-occurrence power iteration) and TF-IDF tiers.
    *
    * Scale: tokens explode once; the segment id is a per-document
    * running count (window partitioned by doc — frame bounded by
    * document length); word and phrase scores are two hash
    * aggregations; the final top-15 is orderBy+limit (TakeOrdered,
    * never a global sort).
    */
  def rakeKeywords(spark: SparkSession, dir: String): DataFrame = {
    val stops = TextQueries.stopEn
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .withColumnRenamed("col", "w")
      .withColumn("is_stop", col("w").isin(stops: _*))
    val phrases = toks
      .withColumn("seg", sum(col("is_stop").cast("long")).over(w))
      .filter(!col("is_stop"))
      .groupBy("doc_id", "seg")
      .agg(concat_ws(" ", expr(
        "transform(sort_array(collect_list(struct(pos, w))), s -> s.w)"))
        .as("phrase"),
        count(lit(1)).as("plen"))
      .filter(col("plen") <= 4)
      .persist(StorageLevel.MEMORY_AND_DISK)
    phrases.count()
    val wscore = phrases
      .select(col("plen"), explode(split(col("phrase"), " ")).as("w"))
      .groupBy("w")
      .agg(sum("plen").as("deg"), count(lit(1)).as("freq"))
      .withColumn("score_ppm", expr("deg * 1000000 div freq"))
    phrases.groupBy("phrase").agg(count(lit(1)).as("n_occurrences"))
      .select(col("phrase"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("w"))
      .join(wscore.select("w", "score_ppm"), Seq("w"))
      .groupBy("phrase", "n_occurrences")
      .agg(sum("score_ppm").as("sc"))
      .orderBy(desc("sc"), desc("n_occurrences"), asc("phrase"))
      .limit(15)
      .select(col("phrase"), col("n_occurrences"),
        (col("sc") / 1e6).as("rake_score"))
  }

  val rakeKeywordsSql: String = {
    val stop = TextQueries.stopEnSql
    s"""WITH docs AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |toks AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(ws) + 1),
       |    i -> {'pos': i, 'w': ws[i]})) AS t
       |  FROM docs),
       |flat AS (SELECT doc_id, t.pos AS pos, t.w AS w FROM toks),
       |seg AS (
       |  SELECT doc_id, pos, w,
       |    SUM(CASE WHEN list_contains($stop, w) THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS seg,
       |    list_contains($stop, w) AS is_stop
       |  FROM flat),
       |phrases AS (
       |  SELECT doc_id, seg,
       |    string_agg(w, ' ' ORDER BY pos) AS phrase,
       |    CAST(COUNT(*) AS BIGINT) AS plen
       |  FROM seg WHERE NOT is_stop
       |  GROUP BY doc_id, seg
       |  HAVING COUNT(*) <= 4),
       |wscore AS (
       |  SELECT w, SUM(plen) * 1000000 // COUNT(*) AS score_ppm FROM (
       |    SELECT plen, unnest(string_split(phrase, ' ')) AS w
       |    FROM phrases)
       |  GROUP BY w),
       |dphrase AS (
       |  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
       |  FROM phrases GROUP BY phrase),
       |scored AS (
       |  SELECT d.phrase, d.n_occurrences,
       |    CAST(SUM(s.score_ppm) AS BIGINT) AS sc
       |  FROM (SELECT phrase, n_occurrences,
       |          unnest(string_split(phrase, ' ')) AS w
       |        FROM dphrase) d
       |  JOIN wscore s USING (w)
       |  GROUP BY d.phrase, d.n_occurrences)
       |SELECT phrase, n_occurrences, sc / 1e6 AS rake_score
       |FROM scored
       |ORDER BY sc DESC, n_occurrences DESC, phrase
       |LIMIT 15""".stripMargin
  }

  def all: Seq[(String, ((SparkSession, String) => DataFrame, String))] =
    Seq(
      "rouge_pairs" -> ((rougePairs _, rougePairsSql)),
      "rake_keywords" -> ((rakeKeywords _, rakeKeywordsSql)))
}
