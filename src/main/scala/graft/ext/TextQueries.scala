package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over the `documents` table (SURVEY.md §2 ext
  * tier): token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All are single-pass narrow projections (no shuffle
  * except the final presentation sort) built from codegen'd built-ins and
  * higher-order functions — at 100 TB this pipeline is embarrassingly
  * parallel and bounded by parquet scan throughput.
  *
  * Shared determinism tricks (see oracle strings): cross-engine word
  * hashes via `md5` hex strings (lexicographic min works identically in
  * Spark and DuckDB), explicit double casts before division.
  */
object TextQueries {

  private[ext] val stopEn = Seq("the", "a", "of", "to", "and", "in", "is", "for")
  private[ext] val stopEnSql = stopEn.map(w => s"'$w'").mkString("[", ", ", "]")

  /** The composite quality score over a `text` column — ONE definition
    * shared by [[textStats]] and [[CurationQueries.corpusCuration]] so the
    * curation gate can never drift from the stats it claims to apply.
    */
  private[ext] def qualityScore: org.apache.spark.sql.Column = {
    val words = split(col("text"), " ")
    val nTokens = size(words)
    val nStop = expr(
      s"size(filter(split(text, ' '), w -> array_contains(array(${stopEn.map(w => s"'$w'").mkString(",")}), w)))")
    round(
      least(lit(1.0), nTokens / lit(50.0)) *
        (lit(1.0) - abs(nStop.cast("double") / nTokens - lit(0.4))),
      6)
  }

  /** DuckDB rendering of [[qualityScore]] (same sharing contract). */
  private[ext] val qualityScoreSql: String =
    s"""ROUND(LEAST(1.0, len(string_split(text, ' ')) / 50.0) *
      |    (1.0 - ABS(CAST(len(list_filter(string_split(text, ' '), w -> list_contains($stopEnSql, w))) AS DOUBLE)
      |      / len(string_split(text, ' ')) - 0.4)), 6)""".stripMargin

  /** Token counting + quality scoring (whitespace tokens, BPE-ish regex
    * tokens, stopword/char ratios, type-token ratio, composite score).
    */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")))
      .withColumn("n_bpe_tokens",
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")))
      .withColumn("n_stop", expr(
        s"size(filter(words, w -> array_contains(array(${stopEn.map(w => s"'$w'").mkString(",")}), w)))"))
      .withColumn("n_distinct", size(array_distinct(col("words"))))
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("n_bpe_tokens"),
        (col("n_chars").cast("double") / col("n_tokens")).as("avg_token_len"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("type_token_ratio"),
        qualityScore.as("quality_score"))
      .orderBy("doc_id")
  }

  val textStatsSql: String =
    s"""SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_bpe_tokens,
      |  CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
      |  CAST(len(list_filter(string_split(text, ' '), w -> list_contains($stopEnSql, w))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS stop_ratio,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS type_token_ratio,
      |  $qualityScoreSql AS quality_score
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Language-ID n-gram/stopword heuristic: score each language by its
    * stopword hit-rate, argmax with a fixed tie-break order. (The testdata
    * vocabulary is English-ish, so `en` dominates — the operator's value
    * is the deterministic scoring scaffold.)
    */
  private val stopLists: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "en" -> stopEn,
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est"))

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val df = Tables(spark, dir, "documents")
      .withColumn("words", split(col("text"), " "))
    val scored = stopLists.foldLeft(df) { case (d, (lang, stops)) =>
      d.withColumn(s"hits_$lang", expr(
        s"size(filter(words, w -> array_contains(array(${stops.map(w => s"'$w'").mkString(",")}), w)))"))
    }
    // argmax with ties broken by language-code order (de < en < es < fr)
    val pred = stopLists.map(_._1).foldRight(lit("und")) { case (lang, els) =>
      val isMax = stopLists.map(_._1).filter(_ != lang)
        .map(o => col(s"hits_$lang") >= col(s"hits_$o"))
        .reduce(_ && _)
      val beatsEarlier = stopLists.map(_._1).takeWhile(_ != lang)
        .map(o => col(s"hits_$lang") > col(s"hits_$o"))
        .foldLeft(lit(true))(_ && _)
      when(isMax && beatsEarlier && col(s"hits_$lang") > 0, lit(lang)).otherwise(els)
    }
    scored.select(
        (col("doc_id") +: col("lang").as("lang_actual") +:
          stopLists.map { case (l, _) => col(s"hits_$l") } :+
          pred.as("lang_pred")): _*)
      .orderBy("doc_id")
  }

  val langIdSql: String = {
    val hits = stopLists.map { case (lang, stops) =>
      s"CAST(len(list_filter(string_split(text, ' '), w -> list_contains(" +
        stops.map(w => s"'$w'").mkString("[", ", ", "]") + s", w))) AS INT) AS hits_$lang"
    }.mkString(",\n      |  ")
    val langs = stopLists.map(_._1)
    val pred = langs.foldRight("'und'") { case (lang, els) =>
      val isMax = langs.filter(_ != lang).map(o => s"hits_$lang >= hits_$o").mkString(" AND ")
      val beats = langs.takeWhile(_ != lang).map(o => s"hits_$lang > hits_$o")
      val cond = (Seq(isMax) ++ beats ++ Seq(s"hits_$lang > 0")).mkString(" AND ")
      s"CASE WHEN $cond THEN '$lang' ELSE $els END"
    }
    s"""SELECT doc_id, lang_actual, hits_de, hits_en, hits_es, hits_fr,
      |  $pred AS lang_pred
      |FROM (
      |  SELECT doc_id, lang AS lang_actual,
      |  $hits
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprinting: whole-text content hash + a shingle
    * fingerprint (min md5 over word 5-grams — the rolling-hash idea with a
    * cross-engine hash).
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .select(
        col("doc_id"),
        md5(lower(trim(col("text")))).as("content_fp"),
        expr("""CASE WHEN size(words) >= 5 THEN
                 array_min(transform(sequence(1, size(words) - 4),
                   i -> md5(concat_ws(' ', slice(words, i, 5)))))
               ELSE md5(text) END""").as("shingle_fp"))
      .orderBy("doc_id")
  }

  val docFingerprintSql: String =
    """SELECT doc_id,
      |  md5(lower(trim(text))) AS content_fp,
      |  CASE WHEN len(string_split(text, ' ')) >= 5 THEN
      |    list_min(list_transform(range(1, len(string_split(text, ' ')) - 3),
      |      i -> md5(array_to_string(string_split(text, ' ')[i:i+4], ' '))))
      |  ELSE md5(text) END AS shingle_fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Deterministic train/valid/test split (80/10/10): bucket = content-
    * independent hash of the doc_id, so the assignment is stable across
    * runs, engines, and (critically, at 100 TB) re-partitions — a random()
    * split re-deals the held-out set every run and leaks test into train.
    * One narrow projection, no shuffle except the presentation sort.
    */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .withColumn("bucket",
        expr("cast(conv(substring(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint) % 100").cast("int"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test").as("split"))
      .orderBy("doc_id")
  }

  val trainTestSplitSql: String =
    """SELECT doc_id, bucket,
      |  CASE WHEN bucket < 80 THEN 'train'
      |       WHEN bucket < 90 THEN 'valid'
      |       ELSE 'test' END AS split
      |FROM (SELECT doc_id,
      |  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS INT) AS bucket
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** Corpus bigram counts: n-gram extraction as a higher-order transform,
    * explode → map-side partial agg → top-20 (deterministic tiebreak).
    * The generator-then-partial-agg shape is the one that scales: the
    * shuffle carries (bigram, partial count), never raw bigram instances.
    */
  def ngramCounts(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(words) - 1), i -> concat(words[i - 1], ' ', words[i]))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  val ngramCountsSql: String =
    """SELECT bigram, COUNT(*) AS n
      |FROM (
      |  SELECT unnest(list_transform(range(1, len(string_split(text, ' '))),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bigram
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2)
      |GROUP BY bigram
      |ORDER BY n DESC, bigram
      |LIMIT 20""".stripMargin

  /** Concat-and-chunk token packing (GPT-style pretraining sharding):
    * documents are concatenated in doc_id order within a shard and cut
    * into fixed `budget`-token chunks; each doc records the chunk its
    * first token lands in. The global sequential cumsum a single ordering
    * would need is the scale trap — instead docs hash into `nShards`
    * independent shards (content-independent md5, deterministic), and the
    * running offset is a window per shard: embarrassingly parallel, one
    * sort per shard, no single-partition window at any corpus size.
    */
  def packChunks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 2048
    val nShards = 8
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        expr(s"cast(conv(substring(md5(cast(doc_id AS string)), 1, 15), 16, 10) AS bigint) % $nShards")
          .cast("int").as("shard"))
      .withColumn("tok_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // (shard << 40) | chunk is collision-free to 2^40 chunks (~2.2e15
      // tokens) per shard; a multiplicative pack caps out near 2.1G.
      .withColumn("chunk_id",
        shiftleft(col("shard").cast("long"), 40)
          .bitwiseOR(floor(col("tok_offset") / budget).cast("long")))
      .select("doc_id", "shard", "n_tokens", "tok_offset", "chunk_id")
      .orderBy("doc_id")
  }

  // DuckDB types SUM(INT) OVER w as HUGEINT (→ float64 through pandas);
  // the CASTs pin tok_offset/chunk_id to BIGINT so the hash compare sees
  // int64 on both engines.
  val packChunksSql: String =
    """SELECT doc_id, shard, n_tokens,
      |  CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS tok_offset,
      |  (CAST(shard AS BIGINT) << 40)
      |    | CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 2048) AS BIGINT) AS chunk_id
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
      |    CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS INT) AS shard
      |  FROM documents)
      |WINDOW w AS (PARTITION BY shard ORDER BY doc_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY doc_id""".stripMargin

  /** Sliding-window chunking with overlap (the RAG / long-context
    * pretraining splitter, complement of [[packChunks]]: pack concatenates
    * docs INTO fixed budgets, this splits docs into overlapping windows).
    * W=200-char chunks on a 150-char stride (50 overlap); a chunk start
    * is emitted iff it is the doc head or the previous chunk did not
    * already reach the end — so tails are never re-emitted as fully-
    * contained fragments, the standard splitter contract.
    *
    * Pure per-doc projection + explode, no shuffle at any corpus size.
    * The chunk fingerprint (md5 of the substring) is what a downstream
    * chunk-level dedup or ANN index would key on.
    */
  def chunkOverlap(spark: SparkSession, dir: String): DataFrame = {
    val w = 200; val s = 150
    Tables(spark, dir, "documents")
      // keep p iff doc head, or the previous chunk (ending at p-stride+W-1
      // = p+49) stopped short of the end; every p from the sequence is
      // already <= length(text)
      .select(col("doc_id"), col("text"), explode(expr(
        s"""filter(sequence(1, greatest(length(text), 1), $s),
              p -> p = 1 OR p + ${w - s - 1} < length(text))"""))
        .as("chunk_start"))
      .select(col("doc_id"), col("chunk_start").cast("long").as("chunk_start"),
        expr(s"cast(length(substring(text, chunk_start, $w)) AS bigint)").as("chunk_len"),
        expr(s"md5(substring(text, chunk_start, $w))").as("chunk_fp"))
      .orderBy("doc_id", "chunk_start")
  }

  val chunkOverlapSql: String =
    """SELECT doc_id, p AS chunk_start,
      |  CAST(len(substr(text, CAST(p AS INT), 200)) AS BIGINT) AS chunk_len,
      |  md5(substr(text, CAST(p AS INT), 200)) AS chunk_fp
      |FROM (
      |  SELECT doc_id, text,
      |    unnest(list_filter(range(1, GREATEST(len(text), 1) + 1, 150),
      |      p -> p = 1 OR p + 49 < len(text))) AS p
      |  FROM documents)
      |ORDER BY doc_id, chunk_start""".stripMargin

  /** Repetition-based quality signals (the Gopher-report family of
    * filters): duplicate-word fraction, most-frequent-word fraction, and
    * duplicate-bigram fraction, with a keep/repetitive verdict. Natural
    * text under ~0.5 dup-word; templated/spammy text spikes all three.
    *
    * All three are per-document HOF projections — no shuffle, scan-bound
    * at any corpus size. The top-word count is O(distinct·words) per doc
    * (documents are bounded; the alternative — explode + per-doc groupBy —
    * would shuffle the full token stream corpus-wide). The verdict
    * compares ROUNDED values so both engines branch on identical doubles.
    */
  def qualityRepetition(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 2)
      .withColumn("n", size(col("words")))
      // max word frequency as the longest RUN in the sorted array —
      // O(n log n) per doc where the distinct×words double loop the
      // oracle (and the r7 form) runs is O(d·n): same integer by
      // construction (a word's occurrences are exactly one run once
      // sorted), ~2× the stage at sf0.1 and growing with doc length
      .withColumn("top_word_n", expr(
        """aggregate(array_sort(words),
           |  struct('' AS prev, 0 AS run, 0 AS best),
           |  (acc, w) -> struct(w AS prev,
           |    IF(w = acc.prev, acc.run + 1, 1) AS run,
           |    greatest(acc.best, IF(w = acc.prev, acc.run + 1, 1)) AS best),
           |  acc -> acc.best)""".stripMargin))
      .withColumn("bigrams", expr(
        "transform(sequence(1, size(words) - 1), i -> concat(words[i - 1], ' ', words[i]))"))
      // 6dp fractions in EXACT integer micros (the qualityClassifier
      // tie discipline): round(p/q, 6) on the double quotient ties on
      // 2-5-smooth q (e.g. a 128-word doc) and the engines' rounding
      // disagrees on ties
      .withColumn("dup_word_frac", expr(
        """(2 * (n - size(array_distinct(words))) * 1000000 + n)
             div (2 * n) / 1e6"""))
      .withColumn("top_word_frac", expr(
        "(2 * top_word_n * 1000000 + n) div (2 * n) / 1e6"))
      .withColumn("dup_bigram_frac", expr(
        """(2 * (size(bigrams) - size(array_distinct(bigrams))) * 1000000
             + size(bigrams)) div (2 * size(bigrams)) / 1e6"""))
      .select(col("doc_id"), col("dup_word_frac"), col("top_word_frac"),
        col("dup_bigram_frac"),
        when(col("dup_word_frac") > 0.75 || col("top_word_frac") > 0.2
          || col("dup_bigram_frac") > 0.3, "repetitive")
          .otherwise("keep").as("verdict"))
      .orderBy("doc_id")
  }

  val qualityRepetitionSql: String =
    """SELECT doc_id, dup_word_frac, top_word_frac, dup_bigram_frac,
      |  CASE WHEN dup_word_frac > 0.75 OR top_word_frac > 0.2
      |    OR dup_bigram_frac > 0.3 THEN 'repetitive' ELSE 'keep' END AS verdict
      |FROM (
      |  SELECT doc_id,
      |    (2 * (len(ws) - len(list_distinct(ws))) * 1000000 + len(ws))
      |      // (2 * len(ws)) / 1e6 AS dup_word_frac,
      |    (2 * list_max(list_transform(list_distinct(ws),
      |        w -> len(list_filter(ws, x -> x = w)))) * 1000000 + len(ws))
      |      // (2 * len(ws)) / 1e6 AS top_word_frac,
      |    (2 * ((len(ws) - 1) - len(list_distinct(list_transform(range(1, len(ws)),
      |        i -> ws[i] || ' ' || ws[i + 1])))) * 1000000 + (len(ws) - 1))
      |      // (2 * (len(ws) - 1)) / 1e6 AS dup_bigram_frac
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 2)
      |ORDER BY doc_id""".stripMargin

  /** Corpus TF-IDF, top-5 terms per document — the canonical corpus-level
    * term-weighting pass (keyword extraction, quality features, BM25-ish
    * retrieval preprocessing).
    *
    * Scale shape, in order: explode tokens → ONE shuffle on
    * `(doc_id, word)` with map-side partial agg (the token stream never
    * moves un-combined); document frequency is a `count` WINDOW over
    * `word` on those already-distinct pairs — NOT a groupBy + self-join,
    * which would compute the whole tokenize/agg subtree twice (the df side
    * co-locates by word either way, and vocabulary grows with the corpus —
    * Heaps' law — so it never broadcasts); the final per-doc top-k is one
    * window on `doc_id`. The doc count rides in as a broadcast 1-row cross
    * join, not a driver `.count()`. Three shuffles total, each keyed where
    * the data has to land anyway.
    *
    * Determinism: score is ROUNDED to 6 decimals in both engines before
    * the window ORDER BY, so a last-ulp `ln` divergence can neither flip a
    * rank nor leak into the hash; ties break on the word itself.
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("word"))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("word")))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("word"), col("tf"), col("df"),
        col("score"))
      .orderBy("doc_id", "rank")
  }

  val tfidfTopTermsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, word, COUNT(*) AS tf
      |  FROM tok WHERE word <> ''
      |  GROUP BY doc_id, word),
      |wdf AS (
      |  SELECT doc_id, word, tf,
      |    COUNT(*) OVER (PARTITION BY word) AS df
      |  FROM tf),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT doc_id, rank, word, tf, df, score FROM (
      |  SELECT t.doc_id, t.word, t.tf, t.df,
      |    ROUND(t.tf * LN(CAST(n.n_docs AS DOUBLE) / t.df), 6) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY t.doc_id
      |      ORDER BY ROUND(t.tf * LN(CAST(n.n_docs AS DOUBLE) / t.df), 6) DESC,
      |        t.word) AS rank
      |  FROM wdf t CROSS JOIN n)
      |WHERE rank <= 5
      |ORDER BY doc_id, rank""".stripMargin

  /** N-GRAM NOVELTY — the dataset-saturation diagnostic: in doc_id
    * (ingest) order, what fraction of each document's distinct word
    * 3-grams has never appeared in ANY earlier document? A corpus whose
    * novelty curve collapses is re-crawling itself — the macro signal
    * the per-pair dedup tier can't see. Each 3-gram's FIRST OWNER is
    * one `min(doc_id)` aggregate on the shingle hash (no ordering, no
    * window over the corpus); novelty is then a per-doc count ratio in
    * exact integer micros. Two shuffles total (shingle, doc) at any
    * corpus size.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    // 60-bit long shingle keys (native ShingleHashes), not 32-hex md5
    // strings: same digest on both engines so any collision merges
    // identically in Spark and the oracle, the per-position interpreted
    // lambda is gone, and the (sh) shuffle key shrinks 32+ bytes → 8
    val shingles = Tables(spark, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(
        graft.functions.ShingleHashes.shingle_hashes(col("words"), 3, distinct = true)).as("sh"))
    val firstOwner = shingles.groupBy("sh").agg(min("doc_id").as("first_doc"))
    shingles.join(firstOwner, Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        expr("(2 * n_novel * 1000000 + n_grams) div (2 * n_grams) / 1e6")
          .as("novelty"))
      .orderBy("doc_id")
  }

  val ngramNoveltySql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    unnest(list_distinct(list_transform(range(1, len(ws) - 1),
      |      i -> CAST(('0x' || substr(md5(array_to_string(ws[i:i+2], ' ')), 1, 15))
      |             AS BIGINT)))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |  WHERE len(ws) >= 3),
      |fo AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh)
      |SELECT s.doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_grams,
      |  CAST(COUNT(*) FILTER (WHERE fo.first_doc = s.doc_id) AS BIGINT)
      |    AS n_novel,
      |  (2 * COUNT(*) FILTER (WHERE fo.first_doc = s.doc_id) * 1000000
      |    + COUNT(*)) // (2 * COUNT(*)) / 1e6 AS novelty
      |FROM sh s JOIN fo ON fo.sh = s.sh
      |GROUP BY s.doc_id
      |ORDER BY s.doc_id""".stripMargin

  /** Sparse TF-IDF document-similarity self-join via an inverted index
    * with a POSTING-LIST CAP — the lexical counterpart of
    * [[SimilarityQueries.embedLshPairs]]: candidate pairs are generated
    * only through words with `2 ≤ df ≤ 50` (rare shared terms — the
    * prefix-filtering idea from string-similarity joins: common words
    * produce quadratic postings and near-zero IDF signal, so the cap
    * removes exactly the terms that would blow the join up at 100 TB
    * while keeping the discriminative ones), and the pair score is the
    * sparse dot product of the docs' capped TF-IDF weights.
    *
    * Scale shape: one tokenized-corpus projection PERSISTED and
    * self-joined on `word` (the cache keeps the documents scan + window
    * single-pass), join fanout ≤ C(cap,2) per word, global top-50 by
    * orderBy+limit = TakeOrdered. Determinism: weights are
    * `floor(tf·ln(N/df)·10⁶)` BIGINTs, so the pair sums are exact and
    * order-free; only the per-posting `ln` is float, at the same
    * rounding discipline as the other lexical oracles.
    */
  def tfidfSimPairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val weighted = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("word")))
      .filter(col("df") >= 2 && col("df") <= 50)
      .crossJoin(broadcast(nDocs))
      .withColumn("w",
        expr("cast(floor(tf * ln(cast(n_docs AS double) / df) * 1000000) AS bigint)"))
      .select(col("doc_id"), col("word"), col("w"))
      .persist()
    val a = weighted.select(col("word"), col("doc_id").as("doc1"), col("w").as("w1"))
    val b = weighted.select(col("word"), col("doc_id").as("doc2"), col("w").as("w2"))
    a.join(b, Seq("word"))
      .filter(col("doc1") < col("doc2"))
      .groupBy("doc1", "doc2")
      .agg(sum(col("w1") * col("w2")).as("score"), count(lit(1)).as("shared_terms"))
      .orderBy(desc("score"), asc("doc1"), asc("doc2")).limit(50)
  }

  val tfidfSimPairsSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
      |tf AS (
      |  SELECT doc_id, word, COUNT(*) AS tf
      |  FROM tok WHERE word <> '' GROUP BY doc_id, word),
      |wdf AS (
      |  SELECT doc_id, word, tf, COUNT(*) OVER (PARTITION BY word) AS df FROM tf),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |wt AS (
      |  SELECT doc_id, word,
      |    CAST(FLOOR(tf * LN(CAST(n_docs AS DOUBLE) / df) * 1000000) AS BIGINT) AS w
      |  FROM wdf CROSS JOIN n WHERE df BETWEEN 2 AND 50),
      |p AS (
      |  SELECT a.doc_id AS doc1, b.doc_id AS doc2,
      |    CAST(SUM(a.w * b.w) AS BIGINT) AS score, COUNT(*) AS shared_terms
      |  FROM wt a JOIN wt b ON a.word = b.word AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT doc1, doc2, score, shared_terms FROM p
      |ORDER BY score DESC, doc1, doc2 LIMIT 50""".stripMargin

  /** BM25 retrieval — top-20 documents for a fixed query-term set (the
    * lexical complement to the embedding similarity tier; Okapi BM25 with
    * k1=1.2, b=0.75). The token stream is FILTERED to the query terms at
    * the explode, so the per-doc agg moves |terms|-bounded rows, not the
    * corpus token stream; document frequency rides as the same count
    * window as [[tfidfTopTerms]]; corpus N and total length broadcast as
    * one 2-scalar row (the scalar branch is a second scan of the table,
    * aggregated map-side to two numbers — cheaper at any scale than
    * persisting the tokenized corpus just to share one pass). The global
    * top-20 is orderBy+limit — TakeOrdered, never a one-partition window
    * over the corpus; the rank window runs AFTER the limit, on 20 rows.
    *
    * Determinism: per-doc scores are ROUNDED before the top-k sort (both
    * engines sort identical doubles); sub-expressions are written in the
    * same literal forms/association on both sides so each contribution is
    * bit-identical before the ≤|terms|-element sum the rounding covers.
    * Docs containing no query term score 0 and do not appear.
    */
  private val bm25Terms = Seq("hash", "join", "vector", "scan")

  def bm25Search(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val scalars = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("sum_dl"))
    val inList = bm25Terms.map(t => s"'$t'").mkString(",")
    val tf = docs
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), size(col("words")).as("dl"),
        explode(expr(
          s"filter(words, w -> array_contains(array($inList), w))")).as("word"))
      .groupBy("doc_id", "dl", "word").agg(count(lit(1)).as("tf"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("word")))
      .crossJoin(broadcast(scalars))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf", log(
        (col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")), 6).as("score"),
        count(lit(1)).as("n_terms"))
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(20)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "doc_id", "n_terms", "score")
      .orderBy("rank")
  }

  /** BM25 with PSEUDO-RELEVANCE FEEDBACK (RM-style two-stage
    * retrieval, Lavrenko & Croft 2001 shape): stage 1 ranks with the
    * seed query ([[bm25Search]]'s exact scoring); the top-10 docs
    * become the feedback set; stage 2 picks the 5 heaviest
    * feedback-set terms (occurrence-weighted, df-ceiling guarded
    * against boilerplate, minus the seed terms, ties by word) as
    * expansion terms at half query weight; stage 3 rescores the corpus
    * with the expanded weighted query. Recall beyond the literal seed
    * terms — the classic fix for vocabulary mismatch.
    *
    * The expansion terms are BOUNDED METADATA (≤5 strings) collected
    * at build, so stage 3 compiles them into the scan predicate like
    * the seed terms — no extra corpus join; the oracle runs the whole
    * chain as CTEs. Determinism: stage-1 cut ties on (rounded score,
    * doc_id); expansion ties on (weight, word) — both total orders.
    */
  def bm25Prf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fb = bm25Search(spark, dir).filter(col("rank") <= 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val docs = Tables(spark, dir, "documents")
    val tok = docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("dl"),
        explode(split(col("text"), " ")).as("word"))
    // candidate terms first: words of the ≤10 feedback docs, minus the
    // seed terms. df is only ever read for THESE words (the expansion
    // join is inner), so the corpus-wide (doc_id, word) distinct below
    // is semi-joined down to candidate words before it shuffles —
    // guide §2.3 (shuffle fewer bytes): the distinct moves the
    // candidate-matching token stream, not the whole corpus vocabulary.
    val cand = tok
      .filter(col("doc_id").isin(fb: _*))
      .filter(!col("word").isin(bm25Terms: _*) && col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("wt"))
    val dfs = tok.select("doc_id", "word")
      .join(broadcast(cand.select("word")), Seq("word"), "left_semi")
      .distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    // corpus size rides as a broadcast scalar instead of a separate
    // blocking driver count() job (one fewer barrier per execution)
    val nDocsDf = docs.agg(count(lit(1)).as("nd"))
    val expansion = cand
      .join(dfs, Seq("word"))
      .crossJoin(broadcast(nDocsDf))
      .filter(col("df") * 10 <= col("nd") * 9)
      .orderBy(desc("wt"), asc("word")).limit(5)
      .select("word").collect().map(_.getString(0)).toSeq
    val weights: Seq[(String, Double)] =
      bm25Terms.map(_ -> 1.0) ++ expansion.map(_ -> 0.5)
    // expansion terms are corpus-derived (untrusted data): build the
    // stage-3 term filter with typed Column APIs only — never spliced
    // into an expr()/SQL string, where a quote in a token would parse
    // as a literal boundary
    val termArr = array(weights.map(t => lit(t._1)): _*)
    val qwMap = map(weights.flatMap { case (w, q) =>
      Seq(lit(w), lit(q)) }.toIndexedSeq: _*)
    val scalars = docs.agg(count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("sum_dl"))
    val tf = docs
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), size(col("words")).as("dl"),
        explode(org.apache.spark.sql.functions.filter(
          col("words"), w => array_contains(termArr, w))).as("word"))
      .groupBy("doc_id", "dl", "word").agg(count(lit(1)).as("tf"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("word")))
      .crossJoin(broadcast(scalars))
      .withColumn("qw", element_at(qwMap, col("word")))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf", log(
        (col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        col("qw") * col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")), 6).as("score"),
        count(lit(1)).as("n_terms"))
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(20)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "doc_id", "n_terms", "score")
      .orderBy("rank")
  }

  val bm25PrfSql: String = {
    val inList = bm25Terms.map(t => s"'$t'").mkString(",")
    val seedVals = bm25Terms.map(t => s"('$t')").mkString(", ")
    s"""WITH s AS (
      |  SELECT COUNT(*) AS n_docs,
      |    SUM(len(string_split(text, ' '))) AS sum_dl
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |    unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |tf1 AS (
      |  SELECT doc_id, dl, word, COUNT(*) AS tf
      |  FROM tok WHERE word IN ($inList)
      |  GROUP BY doc_id, dl, word),
      |wdf1 AS (
      |  SELECT doc_id, dl, word, tf,
      |    COUNT(*) OVER (PARTITION BY word) AS df
      |  FROM tf1),
      |sc1 AS (
      |  SELECT doc_id,
      |    ROUND(SUM(
      |      LN((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
      |        * (tf * 2.2)
      |        / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))
      |    ), 6) AS score
      |  FROM wdf1 CROSS JOIN s
      |  GROUP BY doc_id),
      |top10 AS (
      |  SELECT doc_id FROM sc1 ORDER BY score DESC, doc_id LIMIT 10),
      |dfs AS (
      |  SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY word),
      |cand AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS wt
      |  FROM tok
      |  WHERE doc_id IN (SELECT doc_id FROM top10)
      |    AND word NOT IN ($inList) AND word != ''
      |  GROUP BY word),
      |exp5 AS (
      |  SELECT c.word FROM cand c
      |  JOIN dfs d USING (word) CROSS JOIN s
      |  WHERE d.df * 10 <= s.n_docs * 9
      |  ORDER BY c.wt DESC, c.word LIMIT 5),
      |terms AS (
      |  SELECT word, 1.0 AS qw FROM (VALUES $seedVals) v(word)
      |  UNION ALL SELECT word, 0.5 FROM exp5),
      |tf2 AS (
      |  SELECT t.doc_id, t.dl, t.word, COUNT(*) AS tf
      |  FROM tok t JOIN terms q ON q.word = t.word
      |  GROUP BY t.doc_id, t.dl, t.word),
      |wdf2 AS (
      |  SELECT doc_id, dl, word, tf,
      |    COUNT(*) OVER (PARTITION BY word) AS df
      |  FROM tf2),
      |sc2 AS (
      |  SELECT doc_id,
      |    ROUND(SUM(
      |      q.qw
      |        * LN((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
      |        * (tf * 2.2)
      |        / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))
      |    ), 6) AS score,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms
      |  FROM wdf2 JOIN terms q USING (word) CROSS JOIN s
      |  GROUP BY doc_id)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
      |    AS rank,
      |  doc_id, n_terms, score
      |FROM (SELECT * FROM sc2 ORDER BY score DESC, doc_id LIMIT 20)
      |ORDER BY rank""".stripMargin
  }

  val bm25SearchSql: String = {
    val inList = bm25Terms.map(t => s"'$t'").mkString(",")
    s"""WITH s AS (
      |  SELECT COUNT(*) AS n_docs,
      |    SUM(len(string_split(text, ' '))) AS sum_dl
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |    unnest(string_split(text, ' ')) AS word
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, dl, word, COUNT(*) AS tf
      |  FROM tok WHERE word IN ($inList)
      |  GROUP BY doc_id, dl, word),
      |wdf AS (
      |  SELECT doc_id, dl, word, tf,
      |    COUNT(*) OVER (PARTITION BY word) AS df
      |  FROM tf),
      |sc AS (
      |  SELECT doc_id,
      |    ROUND(SUM(
      |      LN((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
      |        * (tf * 2.2)
      |        / (tf + 1.2 * (0.25 + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))
      |    ), 6) AS score,
      |    COUNT(*) AS n_terms
      |  FROM wdf CROSS JOIN s
      |  GROUP BY doc_id)
      |SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank,
      |  doc_id, n_terms, score
      |FROM sc
      |ORDER BY score DESC, doc_id
      |LIMIT 20""".stripMargin
  }

  /** fastText-style hashed-bag linear classifier inference — the
    * quality/language FILTER MODEL tier of a training-data pipeline
    * (Joulin et al., arXiv:1607.01759: bag of hashed n-gram buckets →
    * linear layer), run as a pure per-document projection. Each token
    * hashes into one of B=4096 buckets (the hashing trick — the model is
    * a bounded weight table, not a vocabulary); the document logit is
    * the mean bucket weight. Here the weight table is a deterministic
    * md5 function of the bucket id so the oracle replays inference
    * end-to-end; production swaps a TRAINED float array broadcast once
    * per executor (the [[graft.functions.CentroidTopK]] pattern) —
    * identical dataflow, zero shuffle either way.
    *
    * Cross-engine float contract: per-token weights are INTEGERS
    * (millis, % 2001 − 1000 ∈ [−1000, 1000]) summed exactly as BIGINT;
    * the only float op is the final single division, so engines can't
    * drift in fold order. `keep` thresholds the integer sum.
    */
  /** The hashed-feature logit body shared by the whole classifier
    * family (quality_classifier, classifier_auc, lift_curve,
    * confusion_matrix, classifier_calibration — it was copy-pasted five
    * times before r15): per token, weight = md5-hash of the token's
    * hash bucket mapped to integer millis in [-1000, 1000], summed
    * exactly as BIGINT in token order. Built with the NATIVE
    * [[graft.functions.Md5Prefix60]] (two digests per token, no
    * hex/conv string churn — the interpreted idiom paid ~4 string ops
    * per token); the DuckDB oracles keep the spelled-out idiom, which
    * is bit-equal (Md5FnSpec pins it).
    */
  private def hashedLogitMillis(B: Int): org.apache.spark.sql.Column = {
    import graft.functions.Md5Prefix60.md5h60
    aggregate(
      transform(col("words"), w =>
        md5h60(concat(lit("w:"), (md5h60(w) % B).cast("string"))) % 2001 - 1000),
      lit(0L), (acc, x) => acc + x)
  }

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val B = 4096
    Tables(spark, dir, "documents")
      .withColumn("words", expr("filter(split(lower(text), ' +'), w -> w != '')"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("logit_millis", hashedLogitMillis(B))
      .select(col("doc_id"), col("n_words"), col("logit_millis"),
        // 6dp rounding done in EXACT integer micros, not on the double
        // quotient: round(p/q, 6) ties exactly when q is 2-5-smooth
        // (n_words=80 → q=80000 made sf0.1 doc 506 a tie), and on a tie
        // Spark's BigDecimal-shortest-repr rounding and DuckDB's binary
        // rounding disagree. Half-away-from-zero on |p|·10⁶/q as pure
        // integer arithmetic is engine-independent by construction.
        expr("""CASE WHEN logit_millis >= 0
                THEN (2 * logit_millis * 1000000 + n_words * 1000)
                       div greatest(2 * n_words * 1000, 1)
                ELSE -((2 * -logit_millis * 1000000 + n_words * 1000)
                       div greatest(2 * n_words * 1000, 1)) END / 1e6""").as("logit"),
        (col("logit_millis") > 0).as("keep"))
      .orderBy("doc_id")
  }

  /** The TRAINED-weights form of [[qualityClassifier]] — what a real
    * pipeline runs: the weight table is a float array loaded from a
    * model artifact, shipped to executors once, and inference is the
    * same zero-shuffle projection (token → hash bucket → weight,
    * document logit = mean). Weights enter the plan as an array literal
    * — exact up to the ~64k-element crossover documented in
    * [[SimilarityQueries]], past which a production table (fastText's
    * default is 2M buckets) switches to a broadcast-variable expression
    * like [[graft.functions.CentroidTopK]]. Sum order is the token
    * order of the document (sequential `aggregate` fold), so the result
    * is run- and partitioning-independent.
    *
    * QualityWeightsSpec pins: given the md5-derived weight table, this
    * path reproduces the oracle-gated hashed query EXACTLY (the weights
    * are integer millis, exact in doubles), and weights survive a
    * file round-trip through [[loadWeights]].
    */
  def qualityClassifierWeighted(docs: DataFrame, weights: Array[Double]): DataFrame = {
    val B = weights.length
    require(B > 0, "empty weight table")
    docs
      .withColumn("wt", array(weights.toIndexedSeq.map(lit(_)): _*))
      .withColumn("words", expr("filter(split(lower(text), ' +'), w -> w != '')"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("logit_sum", {
        // native md5h60 per token (QualityWeightsSpec pins this path
        // against the oracle-gated hashed query, which uses the same
        // hash); get() is the 0-based subscript `wt[i]` was
        import graft.functions.Md5Prefix60.md5h60
        aggregate(
          transform(col("words"), w =>
            get(col("wt"), (md5h60(w) % B).cast("int"))),
          lit(0d), (acc, x) => acc + x)
      })
      .select(col("doc_id"), col("n_words"), col("logit_sum"),
        round(col("logit_sum") / col("n_words"), 6).as("logit"),
        (col("logit_sum") > 0).as("keep"))
  }

  /** Load a weight table from a model artifact: one float per line,
    * read through the Hadoop FileSystem API (object-store portable,
    * same posture as [[DedupIndex.loadBloom]]). The table is driver-side
    * metadata — B floats, KBs to MBs — never row data.
    */
  def loadWeights(spark: SparkSession, path: String): Array[Double] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.nonEmpty).map(_.toDouble).toArray
    finally in.close()
  }

  val qualityClassifierSql: String = {
    val B = 4096
    s"""WITH d AS (
      |  SELECT doc_id,
      |    list_filter(string_split(lower(text), ' '), w -> w != '') AS words
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, CAST(len(words) AS BIGINT) AS n_words,
      |    CAST(COALESCE(list_sum(list_transform(words, w ->
      |      CAST(('0x' || substr(md5('w:' || CAST(
      |        CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $B
      |      AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000)), 0) AS BIGINT)
      |      AS logit_millis
      |  FROM d)
      |SELECT doc_id, n_words, logit_millis,
      |  CASE WHEN logit_millis >= 0
      |    THEN (2 * logit_millis * 1000000 + n_words * 1000)
      |           // greatest(2 * n_words * 1000, 1)
      |    ELSE -((2 * -logit_millis * 1000000 + n_words * 1000)
      |           // greatest(2 * n_words * 1000, 1)) END / 1e6 AS logit,
      |  logit_millis > 0 AS keep
      |FROM s
      |ORDER BY doc_id""".stripMargin
  }

  /** CLASSIFIER AUC — the ranking-quality metric for the
    * [[qualityClassifier]] filter model against the corpus's `lang`
    * ground truth (positive = 'en'), computed EXACTLY by the rank-sum /
    * Mann–Whitney identity on a SCORE HISTOGRAM, never a global sort of
    * documents: scores are the 6dp integer-micros logits (bounded grid,
    * ≤ 2·10⁶ + 1 distinct values at ANY corpus size), so one corpus
    * aggregate collapses N docs to the bounded histogram and the rank
    * window runs on that. Tie handling is the textbook average-rank
    * form, kept in INTEGERS by doubling: a score group with `cb` items
    * below it and `c` members has doubled-average-rank 2·cb + c + 1,
    * so 2·Σranks₊ = Σ p·(2·cb + c + 1) and
    * AUC = (2·Σranks₊ − n₊(n₊+1)) / (2·n₊·n₋) — one exact
    * integer-micros division at the end, zero floats anywhere.
    */
  def classifierAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 4096
    val scored = Tables(spark, dir, "documents")
      .withColumn("words", expr("filter(split(lower(text), ' +'), w -> w != '')"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("logit_millis", hashedLogitMillis(B))
      .select(
        expr("""CASE WHEN logit_millis >= 0
                THEN (2 * logit_millis * 1000000 + n_words * 1000)
                       div greatest(2 * n_words * 1000, 1)
                ELSE -((2 * -logit_millis * 1000000 + n_words * 1000)
                       div greatest(2 * n_words * 1000, 1)) END""").as("score_micros"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    val hist = scored.groupBy("score_micros")
      .agg(count(lit(1)).as("c"), sum("pos").as("p"))
    val below = Window.orderBy("score_micros")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cb", coalesce(sum("c").over(below), lit(0L)))
      .agg(sum("p").as("np"), sum(col("c") - col("p")).as("nn"),
        sum(col("p") * (col("cb") * 2 + col("c") + 1)).as("s2"))
      .select(col("np"), col("nn"),
        expr("""(2 * (s2 - np * (np + 1)) * 1000000 + 2 * np * nn)
                div (2 * 2 * np * nn) / 1e6""").as("auc"))
  }

  /** LIFT / CUMULATIVE-GAINS CURVE for the [[qualityClassifier]] model —
    * the deployment-side readout beside [[classifierAuc]]'s ranking
    * quality: "if we keep only the top q% of documents by classifier
    * score, what fraction of the English corpus do we capture, and at
    * what precision?" Computed on the SAME bounded score histogram as
    * the AUC (6dp integer-micros logits, ≤ 2·10⁶+1 distinct values at
    * any corpus size) — never a global sort of documents. Cut-offs are
    * TIE-SAFE: for each quota ⌈n·q⌉ the selection is the largest
    * score-DESC prefix of WHOLE score groups that fits the quota (a tie
    * group is never split, so the readout is deterministic and
    * identical in both engines); precision/recall/lift are exact ppm
    * divisions.
    */
  def liftCurve(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 4096
    val scored = Tables(spark, dir, "documents")
      .withColumn("words", expr("filter(split(lower(text), ' +'), w -> w != '')"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("logit_millis", hashedLogitMillis(B))
      .select(
        expr("""CASE WHEN logit_millis >= 0
                THEN (2 * logit_millis * 1000000 + n_words * 1000)
                       div greatest(2 * n_words * 1000, 1)
                ELSE -((2 * -logit_millis * 1000000 + n_words * 1000)
                       div greatest(2 * n_words * 1000, 1)) END""").as("score_micros"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    val wdesc = Window.orderBy(desc("score_micros"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hist = scored.groupBy("score_micros")
      .agg(count(lit(1)).as("c"), sum("pos").as("p"))
      .withColumn("cumc", sum("c").over(wdesc))
      .withColumn("cump", sum("p").over(wdesc))
    val tot = hist.agg(sum("c").as("n"), sum("p").as("npos"))
    val quotas = spark.range(1).select(explode(expr(
      "array(1L, 5L, 10L, 25L, 50L)")).as("pct"))
      .crossJoin(broadcast(tot))
      .withColumn("quota", expr("greatest(n * pct div 100, 1)"))
    quotas
      .join(hist, col("cumc") <= col("quota"), "left")
      .groupBy("pct", "quota", "n", "npos")
      .agg(coalesce(max("cumc"), lit(0L)).as("n_selected"),
        coalesce(max("cump"), lit(0L)).as("n_pos_selected"))
      .select(col("pct"), col("quota"), col("n_selected"),
        col("n_pos_selected"),
        (expr("n_pos_selected * 1000000 div greatest(n_selected, 1)")
          / 1e6).as("precision"),
        (expr("n_pos_selected * 1000000 div greatest(npos, 1)") / 1e6)
          .as("recall"),
        (expr("""n_pos_selected * n * 1000000
                 div greatest(n_selected * npos, 1)""") / 1e6).as("lift"))
      .orderBy("pct")
  }

  val liftCurveSql: String = {
    val B = 4096
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    list_filter(string_split(lower(text), ' '), w -> w != '') AS words
       |  FROM documents),
       |s AS (
       |  SELECT
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CAST(COALESCE(list_sum(list_transform(words, w ->
       |      CAST(('0x' || substr(md5('w:' || CAST(
       |        CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $B
       |      AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000)), 0) AS BIGINT)
       |      AS logit_millis,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM d),
       |sc AS (
       |  SELECT CASE WHEN logit_millis >= 0
       |    THEN (2 * logit_millis * 1000000 + n_words * 1000)
       |           // greatest(2 * n_words * 1000, 1)
       |    ELSE -((2 * -logit_millis * 1000000 + n_words * 1000)
       |           // greatest(2 * n_words * 1000, 1)) END AS score_micros, pos
       |  FROM s),
       |hist AS (
       |  SELECT score_micros, CAST(COUNT(*) AS BIGINT) AS c,
       |    CAST(SUM(pos) AS BIGINT) AS p
       |  FROM sc GROUP BY 1),
       |cum AS (
       |  SELECT score_micros, c, p,
       |    SUM(c) OVER (ORDER BY score_micros DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
       |    SUM(p) OVER (ORDER BY score_micros DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cump
       |  FROM hist),
       |tot AS (SELECT SUM(c) AS n, SUM(p) AS npos FROM hist),
       |quotas AS (
       |  SELECT pct, GREATEST(n * pct // 100, 1) AS quota, n, npos
       |  FROM (SELECT unnest([1, 5, 10, 25, 50]) AS pct) CROSS JOIN tot)
       |SELECT CAST(q.pct AS BIGINT) AS pct,
       |  CAST(q.quota AS BIGINT) AS quota,
       |  CAST(COALESCE(MAX(cum.cumc), 0) AS BIGINT) AS n_selected,
       |  CAST(COALESCE(MAX(cum.cump), 0) AS BIGINT) AS n_pos_selected,
       |  (COALESCE(MAX(cum.cump), 0) * 1000000
       |    // GREATEST(COALESCE(MAX(cum.cumc), 0), 1)) / 1e6 AS precision,
       |  (COALESCE(MAX(cum.cump), 0) * 1000000
       |    // GREATEST(q.npos, 1)) / 1e6 AS recall,
       |  (COALESCE(MAX(cum.cump), 0) * q.n * 1000000
       |    // GREATEST(COALESCE(MAX(cum.cumc), 0) * q.npos, 1)) / 1e6
       |    AS lift
       |FROM quotas q
       |LEFT JOIN cum ON cum.cumc <= q.quota
       |GROUP BY q.pct, q.quota, q.n, q.npos
       |ORDER BY pct""".stripMargin
  }

  /** CONFUSION MATRIX at the [[qualityClassifier]] decision threshold
    * (logit > 0, the model's own `keep` flag) against the `lang='en'`
    * ground truth — the THRESHOLDED eval completing the classifier
    * readout set ([[classifierAuc]] ranks, [[liftCurve]] sweeps
    * quotas; this scores the single operating point a filter actually
    * deploys). tp/fp/fn/tn are one conditional aggregate over the
    * scored corpus; precision/recall/F1 are exact ppm (F1 as
    * 2tp·10⁶ div (2tp+fp+fn)); MCC is the one double —
    * (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn)) with the √
    * factors multiplied in DOUBLE (the product clears 2⁶³ long before
    * the counts do), zero-denominator guarded identically in both
    * engines.
    */
  def confusionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val B = 4096
    Tables(spark, dir, "documents")
      .withColumn("words", expr("filter(split(lower(text), ' +'), w -> w != '')"))
      .withColumn("logit_millis", hashedLogitMillis(B))
      .select((col("logit_millis") > 0).as("pred"),
        (col("lang") === "en").as("pos"))
      .agg(
        sum(expr("CASE WHEN pred AND pos THEN 1 ELSE 0 END")).as("tp"),
        sum(expr("CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END")).as("fp"),
        sum(expr("CASE WHEN NOT pred AND pos THEN 1 ELSE 0 END")).as("fn"),
        sum(expr("CASE WHEN NOT pred AND NOT pos THEN 1 ELSE 0 END")).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        (expr("tp * 1000000 div greatest(tp + fp, 1)") / 1e6)
          .as("precision"),
        (expr("tp * 1000000 div greatest(tp + fn, 1)") / 1e6)
          .as("recall"),
        (expr("2 * tp * 1000000 div greatest(2 * tp + fp + fn, 1)") / 1e6)
          .as("f1"),
        expr("""CASE WHEN (tp + fp) > 0 AND (tp + fn) > 0
                  AND (tn + fp) > 0 AND (tn + fn) > 0 THEN
                ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
                     - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
                  / SQRT(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                       * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)),
                  6)
                END""").as("mcc"))
  }

  val confusionMatrixSql: String = {
    val B = 4096
    s"""WITH d AS (
       |  SELECT lang,
       |    list_filter(string_split(lower(text), ' '), w -> w != '') AS words
       |  FROM documents),
       |s AS (
       |  SELECT
       |    CAST(COALESCE(list_sum(list_transform(words, w ->
       |      CAST(('0x' || substr(md5('w:' || CAST(
       |        CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $B
       |      AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000)), 0) AS BIGINT)
       |      > 0 AS pred,
       |    lang = 'en' AS pos
       |  FROM d),
       |m AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN pred AND pos THEN 1 ELSE 0 END) AS BIGINT) AS tp,
       |    CAST(SUM(CASE WHEN pred AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS fp,
       |    CAST(SUM(CASE WHEN NOT pred AND pos THEN 1 ELSE 0 END) AS BIGINT) AS fn,
       |    CAST(SUM(CASE WHEN NOT pred AND NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS tn
       |  FROM s)
       |SELECT tp, fp, fn, tn,
       |  (tp * 1000000 // GREATEST(tp + fp, 1)) / 1e6 AS precision,
       |  (tp * 1000000 // GREATEST(tp + fn, 1)) / 1e6 AS recall,
       |  (2 * tp * 1000000 // GREATEST(2 * tp + fp + fn, 1)) / 1e6 AS f1,
       |  CASE WHEN (tp + fp) > 0 AND (tp + fn) > 0
       |    AND (tn + fp) > 0 AND (tn + fn) > 0 THEN
       |  ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
       |       - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
       |    / SQRT(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
       |         * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6)
       |  END AS mcc
       |FROM m""".stripMargin
  }

  /** TOP COLLOCATIONS by POINTWISE MUTUAL INFORMATION — which word
    * pairs co-occur in documents far beyond chance: the association
    * signal under phrase mining and tokenizer-merge heuristics, next
    * to [[bpeTopPairs]]' adjacency counts (PMI is document-level and
    * frequency-normalized, so it surfaces "strong but rare" pairs BPE
    * counts drown). Same scale discipline as [[tfidfSimPairs]], with a
    * RELATIVE ceiling: only terms with 2 ≤ df ≤ 0.8·N generate
    * candidates — near-ubiquitous words both explode the pair space
    * quadratically AND carry no association signal (an absolute cap
    * like tfidf's 50 assumes a long-tail vocabulary; this corpus's is
    * 31 words, all near-ubiquitous, so the ceiling must scale with N).
    * PMI = ln(N·c_xy/(c_x·c_y)) as floor-at-6dp micros on exact
    * integer ratios (the [[nbLangClassify]] discipline); pairs need
    * c_xy ≥ 3 support; top-20 by (pmi, x, y) as TakeOrdered.
    */
  /** TEXTRANK KEYWORDS (Mihalcea & Tarau 2004) — graph-based keyword
    * extraction: words are nodes, adjacency co-occurrences are weighted
    * edges, and importance is the stationary rank on that graph — the
    * unsupervised keyword signal next to [[tokenPmi]]'s pairwise
    * association (PMI scores PAIRS; TextRank scores WORDS by their
    * whole neighborhood). Runs the weighted PageRank update in the
    * EXACT INTEGER discipline of [[GraphQueries.pageRank]]: ranks in
    * 10¹² mass units, per-edge contribution `rank·w div strength(s)`
    * on DECIMAL(38)/HUGEINT (rank·w clears 2⁶³ at corpus-scale edge
    * weights — the pareto_abc overflow lesson pre-applied), damping
    * `(15·10¹² + 85·Σ) div 100`, 3 rounds, bit-exact oracle replay.
    *
    * Scale shape: the bigram edge aggregate is one corpus pass + one
    * (s,t) shuffle to VOCABULARY-sized tables (Heaps-sublinear);
    * edges persist with their `s`-partitioning across rounds, only
    * the rank table moves; top-20 is TakeOrdered.
    */
  def keywordTextrank(spark: SparkSession, dir: String): DataFrame = {
    val bi = Tables(spark, dir, "documents")
      .select(split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """filter(transform(sequence(1, size(ws) - 1),
             i -> named_struct('a', ws[i-1], 'b', ws[i])),
           p -> p.a != '' AND p.b != '' AND p.a != p.b)""")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val e = bi.select(col("a").as("s"), col("b").as("t"))
      .unionAll(bi.select(col("b").as("s"), col("a").as("t")))
      .groupBy("s", "t").agg(count(lit(1)).as("w"))
    val strength = e.groupBy("s").agg(sum("w").as("strength"))
    val ed = e.join(strength, "s").repartition(col("s")).persist()
    try {
      val init = strength.select(col("s").as("node"),
        lit(1000000000000L).as("rank"))
      val ranks = (1 to 3).foldLeft(init) { (r, _) =>
        ed.join(r.withColumnRenamed("node", "s"), "s")
          .select(col("t"), expr(
            "CAST(rank AS DECIMAL(38,0)) * w div strength").as("contrib"))
          .groupBy("t")
          .agg(expr(
            "CAST((15 * 1000000000000 + 85 * sum(contrib)) div 100 AS BIGINT)")
            .as("rank"))
          .select(col("t").as("node"), col("rank"))
      }
      ranks.orderBy(desc("rank"), asc("node")).limit(20)
        .select(col("node").as("word"), col("rank"))
        .localCheckpoint()
    } finally ed.unpersist()
  }

  private def textrankIterSql(i: Int): String =
    s"""r$i AS (SELECT e.t AS node,
       |    CAST((15 * 1000000000000 + 85 *
       |          SUM(CAST(r${i - 1}.rank AS HUGEINT) * e.w // d.strength))
       |         // 100 AS BIGINT) AS rank
       |  FROM e JOIN r${i - 1} ON e.s = r${i - 1}.node
       |  JOIN d ON e.s = d.node
       |  GROUP BY e.t),""".stripMargin

  val keywordTextrankSql: String = {
    val rounds = (1 to 3).map(textrankIterSql).mkString("\n")
    s"""WITH ws0 AS (
       |  SELECT string_split(lower(text), ' ') AS ws FROM documents
       |  WHERE len(string_split(lower(text), ' ')) >= 2),
       |bi AS (
       |  SELECT a, b FROM (
       |    SELECT u.a AS a, u.b AS b FROM (
       |      SELECT unnest(list_transform(range(1, len(ws)),
       |        i -> struct_pack(a := ws[i], b := ws[i+1]))) AS u
       |      FROM ws0))
       |  WHERE a != '' AND b != '' AND a != b),
       |e AS (
       |  SELECT s, t, CAST(COUNT(*) AS BIGINT) AS w FROM (
       |    SELECT a AS s, b AS t FROM bi
       |    UNION ALL SELECT b AS s, a AS t FROM bi)
       |  GROUP BY s, t),
       |d AS (SELECT s AS node, CAST(SUM(w) AS BIGINT) AS strength
       |      FROM e GROUP BY s),
       |r0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS rank FROM d),
       |$rounds
       |fin AS (SELECT node, rank FROM r3)
       |SELECT node AS word, rank FROM fin
       |ORDER BY rank DESC, word LIMIT 20""".stripMargin
  }

  def tokenPmi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dw = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " +")).as("word"))
      .filter(col("word") =!= "")
      .distinct()
      .withColumn("df", count(lit(1)).over(Window.partitionBy("word")))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= 2 && col("df") * 5 <= col("n_docs") * 4)
      .select("doc_id", "word", "df")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = dw.as("a").join(dw.as("b"), Seq("doc_id"))
      .filter(col("a.word") < col("b.word"))
      .groupBy(col("a.word").as("x"), col("b.word").as("y"),
        col("a.df").as("cx"), col("b.df").as("cy"))
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= 3)
    pairs.crossJoin(broadcast(nDocs))
      .select(col("x"), col("y"), col("cx"), col("cy"), col("cxy"),
        expr("""CAST(FLOOR(LN(CAST(cxy AS DOUBLE) * n_docs / (cx * cy))
                * 1000000) AS BIGINT) / 1e6""").as("pmi"))
      .orderBy(desc("pmi"), asc("x"), asc("y")).limit(20)
  }

  val tokenPmiSql: String =
    """WITH dw0 AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_filter(string_split(lower(text), ' '),
      |      w -> w != '')) AS word
      |  FROM documents),
      |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      |dw AS (
      |  SELECT doc_id, word, df FROM (
      |    SELECT doc_id, word,
      |      CAST(COUNT(*) OVER (PARTITION BY word) AS BIGINT) AS df
      |    FROM dw0) CROSS JOIN nd
      |  WHERE df >= 2 AND df * 5 <= n_docs * 4),
      |pairs AS (
      |  SELECT a.word AS x, b.word AS y, a.df AS cx, b.df AS cy,
      |    CAST(COUNT(*) AS BIGINT) AS cxy
      |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.word < b.word
      |  GROUP BY 1, 2, 3, 4
      |  HAVING COUNT(*) >= 3)
      |SELECT x, y, cx, cy, cxy,
      |  CAST(FLOOR(LN(CAST(cxy AS DOUBLE) * n_docs / (cx * cy))
      |    * 1000000) AS BIGINT) / 1e6 AS pmi
      |FROM pairs CROSS JOIN nd
      |ORDER BY pmi DESC, x, y
      |LIMIT 20""".stripMargin

  /** CHARACTER-BIGRAM ENTROPY per document — the randomness axis of
    * quality filtering ([[textStats]] measures shape, [[readability]]
    * difficulty, this one INFORMATION): binary-ish garbage and
    * key-mash score high, degenerate repetition scores near zero, and
    * both tails are what a curation pass drops. Exact construction:
    * H = ln n − (Σ c·ln c)/n over the per-doc bigram histogram,
    * carried as floor-at-6dp ln micros times exact counts (BIGINT
    * sums, order-free), closed with one signed half-up division.
    *
    * ZERO-EXCHANGE shape: a per-document statistic never needs a
    * corpus-wide shuffle, so the histogram is computed IN-ROW by the
    * native codegen'd [[graft.functions.BigramSclc]] expression (one
    * primitive-long sort + run-length scan per doc, O(len·log len),
    * inside whole-stage codegen) — no explode, no (doc, gram)
    * exchange; the only exchange in the plan is the final
    * presentation orderBy. (The original form paid a corpus-wide
    * explode + (doc_id, gram) hash aggregate; an intermediate pure-HOF
    * in-row form paid ~2.4× that in interpreted-lambda CPU — both
    * recorded in PLANS.md.) The run counts are exactly the groupBy
    * counts, so the result is bit-identical; the DuckDB oracle keeps
    * the explode+groupBy spelling.
    */
  def charEntropy(spark: SparkSession, dir: String): DataFrame = {
    // the histogram fold runs in graft.functions.BigramSclc — a native
    // codegen'd expression (one primitive-long sort + run-length scan
    // per doc). A pure-HOF spelling of the same fold (code-point
    // transform → packed-bigram transform → array_sort → run-length
    // aggregate) measured ~6.8 s on the sf0.1 suite row: every stage is
    // an interpreted boxed lambda per character. BigramSpec pins the
    // expression == HOF == explode+groupBy equality.
    Tables(spark, dir, "documents")
      .select(col("doc_id"), lower(col("text")).as("t"))
      .filter(length(col("t")) >= 2)
      .select(col("doc_id"),
        (length(col("t")) - 1).cast("long").as("n"),
        graft.functions.BigramSclc.bigramSclc(col("t")).as("sclc"))
      .select(col("doc_id"), col("n").as("n_bigrams"),
        expr("""CAST(FLOOR(LN(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
                - CASE WHEN sclc >= 0 THEN (2 * sclc + n) div (2 * n)
                  ELSE -((2 * -sclc + n) div (2 * n)) END""").as("h_micros"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("h_micros") / 1e6).as("entropy_nats"),
        when(col("h_micros") < 2000000, "degenerate")
          .when(col("h_micros") > 4500000, "high")
          .otherwise("normal").as("band"))
      .orderBy("doc_id")
  }

  val charEntropySql: String =
    """WITH d AS (
      |  SELECT doc_id, lower(text) AS t FROM documents
      |  WHERE length(lower(text)) >= 2),
      |grams AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(1, length(t)),
      |      i -> substr(t, CAST(i AS INT), 2))) AS g
      |  FROM d),
      |cnt AS (
      |  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM grams GROUP BY 1, 2),
      |agg AS (
      |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(SUM(c * CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1000000)
      |      AS BIGINT)) AS BIGINT) AS sclc
      |  FROM cnt GROUP BY 1),
      |h AS (
      |  SELECT doc_id, n,
      |    CAST(FLOOR(LN(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
      |      - CASE WHEN sclc >= 0 THEN (2 * sclc + n) // (2 * n)
      |        ELSE -((2 * -sclc + n) // (2 * n)) END AS h_micros
      |  FROM agg)
      |SELECT doc_id, n AS n_bigrams,
      |  h_micros / 1e6 AS entropy_nats,
      |  CASE WHEN h_micros < 2000000 THEN 'degenerate'
      |       WHEN h_micros > 4500000 THEN 'high'
      |       ELSE 'normal' END AS band
      |FROM h
      |ORDER BY doc_id""".stripMargin

  /** ZIPF FIT — the log-log rank–frequency slope of the vocabulary
    * (Zipf's law predicts ≈ −1; a corpus that fits badly is either
    * templated/synthetic or tokenized wrong — a cheap generation-
    * artifact detector for LLM-produced text, whose rank curves run
    * flatter than natural language). Frequencies from one token
    * aggregate; ranks fully tie-broken by (freq DESC, word); ln(rank)
    * and ln(freq) floor-quantized to integer micros (the
    * [[nbLangClassify]] discipline) so the closed-form OLS slope runs
    * on exact DECIMAL(38) moments with ONE signed half-up division at
    * the end. Ranks come from the two-phase distributed rank
    * ([[DistRank.globalRank]], 0-based + 1): the vocabulary grows
    * sublinearly (Heaps' law) but still corpus-bound, so the old
    * single-partition `row_number` window would eventually straggle —
    * now no task sorts more than ~V/P vocabulary rows.
    */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val freq0 = Tables(spark, dir, "documents")
      .select(explode(expr("filter(split(lower(text), ' +'), w -> w != '')"))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))
    val freq = DistRank.globalRank(freq0, "r0", Seq(desc("f"), asc("word")))
      .withColumn("r", col("r0") + 1)
      .select(
        expr("CAST(FLOOR(LN(CAST(r AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("lx"),
        expr("CAST(FLOOR(LN(CAST(f AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("ly"))
    freq.agg(count(lit(1)).cast("decimal(38,0)").as("m"),
        sum(col("lx").cast("decimal(38,0)")).as("sx"),
        sum(col("ly").cast("decimal(38,0)")).as("sy"),
        sum(col("lx").cast("decimal(38,0)") * col("ly")).as("sxy"),
        sum(col("lx").cast("decimal(38,0)") * col("lx")).as("sxx"))
      .select(col("m").cast("long").as("vocab"),
        expr("""CASE WHEN m * sxx - sx * sx = 0 THEN NULL
                ELSE CASE WHEN (m * sxy - sx * sy) >= 0
                  THEN (2 * (m * sxy - sx * sy) * 1000000
                          + (m * sxx - sx * sx))
                       div (2 * (m * sxx - sx * sx))
                  ELSE -((2 * -(m * sxy - sx * sy) * 1000000
                          + (m * sxx - sx * sx))
                       div (2 * (m * sxx - sx * sx))) END / 1e6
                END""").as("zipf_slope"))
  }

  val zipfFitSql: String =
    """WITH tok AS (
      |  SELECT unnest(list_filter(string_split(lower(text), ' '),
      |    w -> w != '')) AS word
      |  FROM documents),
      |freq AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM tok GROUP BY 1),
      |ranked AS (
      |  SELECT CAST(FLOOR(LN(CAST(ROW_NUMBER() OVER (ORDER BY f DESC, word)
      |      AS DOUBLE)) * 1000000) AS BIGINT) AS lx,
      |    CAST(FLOOR(LN(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS ly
      |  FROM freq),
      |m AS (
      |  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
      |    CAST(SUM(lx) AS HUGEINT) AS sx, CAST(SUM(ly) AS HUGEINT) AS sy,
      |    CAST(SUM(CAST(lx AS HUGEINT) * ly) AS HUGEINT) AS sxy,
      |    CAST(SUM(CAST(lx AS HUGEINT) * lx) AS HUGEINT) AS sxx
      |  FROM ranked)
      |SELECT CAST(m AS BIGINT) AS vocab,
      |  CASE WHEN m * sxx - sx * sx = 0 THEN NULL
      |  ELSE CAST(CASE WHEN (m * sxy - sx * sy) >= 0
      |    THEN (2 * (m * sxy - sx * sy) * 1000000
      |            + (m * sxx - sx * sx))
      |         // (2 * (m * sxx - sx * sx))
      |    ELSE -((2 * -(m * sxy - sx * sy) * 1000000
      |            + (m * sxx - sx * sx))
      |         // (2 * (m * sxx - sx * sx))) END AS BIGINT) / 1e6
      |  END AS zipf_slope
      |FROM m""".stripMargin

  /** WORD BURSTINESS — variance-to-mean ratio of per-document counts
    * (Church & Gale's burstiness: a content word appears many times in
    * the few documents that are ABOUT it, a function word sprinkles
    * uniformly — VMR ≈ 1 is Poisson/function-like, VMR ≫ 1 is bursty/
    * topical): the statistical complement to [[tokenPmi]]'s pair
    * association for keyword and stopword discovery. Zero-count
    * documents are part of the definition, handled WITHOUT densifying:
    * VMR = (N·Σc² − (Σc)²)/(N·Σc) over each word's nonzero counts plus
    * the implicit zeros — exact integer moments, one half-up micros
    * division, same relative df ceiling as tokenPmi, top-20
    * TakeOrdered.
    */
  def textBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    docs
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), ' +'), w -> w != '')"))
          .as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      .groupBy("word")
      .agg(count(lit(1)).as("df"), sum("c").as("sc"),
        sum(col("c") * col("c")).as("sc2"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= 2 && col("df") * 5 <= col("n_docs") * 4)
      .select(col("word"), col("df"), col("sc").as("total_count"),
        expr("""(2 * (n_docs * sc2 - sc * sc) * 1000000 + n_docs * sc)
                div (2 * n_docs * sc) / 1e6""").as("vmr"))
      .orderBy(desc("vmr"), asc("word")).limit(20)
  }

  val textBurstinessSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(lower(text), ' '),
      |      w -> w != '')) AS word
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2),
      |m AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
      |    CAST(SUM(c) AS BIGINT) AS sc,
      |    CAST(SUM(c * c) AS BIGINT) AS sc2
      |  FROM tf GROUP BY 1),
      |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
      |SELECT word, df, sc AS total_count,
      |  (2 * (n_docs * sc2 - sc * sc) * 1000000 + n_docs * sc)
      |    // (2 * n_docs * sc) / 1e6 AS vmr
      |FROM m CROSS JOIN nd
      |WHERE df >= 2 AND df * 5 <= n_docs * 4
      |ORDER BY vmr DESC, word
      |LIMIT 20""".stripMargin

  /** BOILERPLATE / TEMPLATE DETECTION per source — the share of a
    * source's documents opening with its single most common 5-word
    * prefix: crawl pipelines use exactly this to find injected
    * headers, cookie banners and scraper artifacts BEFORE they skew
    * dedup (a shared template turns distinct pages into near-dups).
    * Prefix = md5 of the first 5 words (the shingle idiom); mode per
    * source via one count aggregate + rank window on the bounded
    * (source, prefix) rollup; share by the half-up micros idiom.
    */
  def boilerplateDetect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pre = Tables(spark, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 5)
      .select(col("source"),
        expr("md5(concat_ws(' ', slice(words, 1, 5)))").as("prefix"))
    val counts = pre.groupBy("source", "prefix")
      .agg(count(lit(1)).as("c"))
      .withColumn("n_docs",
        sum("c").over(Window.partitionBy("source")))
      .withColumn("rk", row_number().over(Window.partitionBy("source")
        .orderBy(desc("c"), asc("prefix"))))
    counts.filter(col("rk") === 1)
      .select(col("source"), col("n_docs"), col("c").as("n_top_prefix"),
        col("prefix").as("top_prefix"),
        expr("(2 * c * 1000000 + n_docs) div (2 * n_docs) / 1e6")
          .as("share"))
      .orderBy("source")
  }

  val boilerplateDetectSql: String =
    """WITH pre AS (
      |  SELECT source,
      |    md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS prefix
      |  FROM documents
      |  WHERE len(string_split(text, ' ')) >= 5),
      |counts AS (
      |  SELECT source, prefix, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM pre GROUP BY 1, 2),
      |ranked AS (
      |  SELECT source, prefix, c,
      |    CAST(SUM(c) OVER (PARTITION BY source) AS BIGINT) AS n_docs,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY c DESC, prefix) AS rk
      |  FROM counts)
      |SELECT source, n_docs, c AS n_top_prefix, prefix AS top_prefix,
      |  (2 * c * 1000000 + n_docs) // (2 * n_docs) / 1e6 AS share
      |FROM ranked
      |WHERE rk = 1
      |ORDER BY source""".stripMargin

  /** MULTINOMIAL NAIVE BAYES language classifier — TRAINED AND RUN
    * inside the engine under the full hash oracle, the third
    * learned-model tier next to [[qualityClassifier]] (fixed hashed
    * weights) and [[graft.ext.KMeans]] (iterative centroids): per-word
    * per-language counts with Laplace smoothing become integer-micros
    * log-probabilities (`floor(ln((c+1)/(tot+V))·10⁶)`, the ln-at-6dp
    * discipline), a document's per-language score is the exact BIGINT
    * sum of its tokens' terms plus the class-prior term, and the
    * argmax breaks ties alphabetically — so train → classify → confuse
    * is deterministic end to end with zero order-sensitive floats.
    *
    * Scale shape: the model (vocab × 5 langs) is built by ONE
    * word-keyed aggregate and persisted — it feeds the scalar totals
    * AND the inference join, so the corpus is read exactly twice
    * (model build, token-join inference) plus one column-pruned pass
    * for priors; smoothing totals derive from the model, never a third
    * token pass. Tokenless documents are unclassifiable and drop from
    * the confusion matrix in both engines (inner token join). Output =
    * the (true, predicted) confusion matrix, ≤25 rows at any corpus
    * size.
    */
  def nbLangClassify(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    def tok = Tables(spark, dir, "documents")
      .withColumn("words", expr("filter(split(lower(text), ' +'), w -> w != '')"))
      .select(col("doc_id"), col("lang"), explode(col("words")).as("word"))
    val cAggs = langs.map(l =>
      sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"c_$l"))
    val wl = tok.groupBy("word").agg(cAggs.head, cAggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val scal = wl.agg(count(lit(1)).as("v"),
      langs.map(l => sum(col(s"c_$l")).as(s"tot_$l")): _*)
    val priors = Tables(spark, dir, "documents").agg(count(lit(1)).as("nd"),
      langs.map(l =>
        sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"nd_$l")): _*)
    val model = wl.crossJoin(broadcast(scal))
      .select(col("word") +: langs.map(l => expr(
        s"CAST(FLOOR(LN(CAST(c_$l + 1 AS DOUBLE) / (tot_$l + v)) * 1000000) AS BIGINT)"
      ).as(s"lp_$l")): _*)
    val scored = tok.join(model, "word")
      .groupBy(col("doc_id"), col("lang").as("lang_true"))
      .agg(sum(col(s"lp_${langs.head}")).as(s"s_${langs.head}"),
        langs.tail.map(l => sum(col(s"lp_$l")).as(s"s_$l")): _*)
      .crossJoin(broadcast(priors))
      .select(col("doc_id") +: col("lang_true") +: langs.map(l => expr(
        s"s_$l + CAST(FLOOR(LN(CAST(nd_$l AS DOUBLE) / nd) * 1000000) AS BIGINT)"
      ).as(s"t_$l")): _*)
    val m = greatest(langs.map(l => col(s"t_$l")): _*)
    scored
      .withColumn("pred",
        langs.init.foldLeft(when(lit(false), "")) { (acc, l) =>
          acc.when(col(s"t_$l") === m, l)
        }.otherwise(langs.last))
      .groupBy(col("lang_true"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang_true", "pred")
  }

  val nbLangClassifySql: String = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val cCols = langs.map(l =>
      s"CAST(SUM(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS c_$l")
      .mkString(",\n      |    ")
    val totCols = langs.map(l =>
      s"CAST(SUM(c_$l) AS BIGINT) AS tot_$l").mkString(",\n      |    ")
    val ndCols = langs.map(l =>
      s"CAST(SUM(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS nd_$l")
      .mkString(",\n      |    ")
    val lpCols = langs.map(l =>
      s"CAST(FLOOR(LN(CAST(c_$l + 1 AS DOUBLE) / (tot_$l + v)) * 1000000) AS BIGINT) AS lp_$l")
      .mkString(",\n      |    ")
    val sCols = langs.map(l =>
      s"CAST(SUM(lp_$l) AS BIGINT) AS s_$l").mkString(",\n      |    ")
    val tCols = langs.map(l =>
      s"s_$l + CAST(FLOOR(LN(CAST(nd_$l AS DOUBLE) / nd) * 1000000) AS BIGINT) AS t_$l")
      .mkString(",\n      |    ")
    val gr = langs.map(l => s"t_$l").mkString(", ")
    val predCase = langs.init.map(l =>
      s"WHEN t_$l = GREATEST($gr) THEN '$l'").mkString("\n      |      ") +
      s"\n      |      ELSE '${langs.last}'"
    s"""WITH d AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(lower(text), ' '), w -> w != '') AS words
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, lang, unnest(words) AS word FROM d),
      |wl AS (
      |  SELECT word,
      |    $cCols
      |  FROM tok GROUP BY word),
      |scal AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS v,
      |    $totCols
      |  FROM wl),
      |pri AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |    $ndCols
      |  FROM documents),
      |model AS (
      |  SELECT word,
      |    $lpCols
      |  FROM wl CROSS JOIN scal),
      |sc AS (
      |  SELECT doc_id, lang AS lang_true,
      |    $sCols
      |  FROM tok JOIN model USING (word)
      |  GROUP BY doc_id, lang),
      |tot AS (
      |  SELECT lang_true,
      |    $tCols
      |  FROM sc CROSS JOIN pri),
      |p AS (
      |  SELECT lang_true,
      |    CASE $predCase END AS pred
      |  FROM tot)
      |SELECT lang_true, pred, CAST(COUNT(*) AS BIGINT) AS n
      |FROM p
      |GROUP BY lang_true, pred
      |ORDER BY lang_true, pred""".stripMargin
  }

  /** FLESCH READING-EASE scoring — the readability tier of the quality
    * stack ([[textStats]] measures surface shape, [[qualityRepetition]]
    * degeneracy, this one audience difficulty): words per sentence and
    * syllables per word (vowel-group heuristic, the standard
    * dictionary-free approximation), combined by the published formula
    * 206.835 − 1.015·WPS − 84.6·SPW. Pure per-document projection,
    * zero shuffle.
    *
    * Cross-engine float contract: WPS and SPW are exact integer micros
    * (half-up idiom), and the formula itself runs in integer NANOS
    * (206835·10⁶ − 1015·wps_micros − 84600·spw_micros) — a 4dp-rounded
    * double product of a 6dp value can land exactly on a rounding
    * boundary where Spark's BigDecimal and DuckDB's binary rounding
    * disagree, so no float ever enters; the one division is the final
    * /10⁹ display conversion and the difficulty bands compare nanos.
    */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(lower(text), ' +'), w -> w != '')"))
          .cast("long").as("n_words"),
        greatest(lit(1L),
          regexp_count(col("text"), lit("[.!?]+")).cast("long"))
          .as("n_sentences"),
        greatest(lit(1L),
          regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long"))
          .as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("wps_micros",
        expr("(2 * n_words * 1000000 + n_sentences) div (2 * n_sentences)"))
      .withColumn("spw_micros",
        expr("(2 * n_syllables * 1000000 + n_words) div (2 * n_words)"))
      .withColumn("flesch_nanos", expr(
        "206835000000 - 1015 * wps_micros - 84600 * spw_micros"))
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        (col("wps_micros") / 1e6).as("words_per_sentence"),
        (col("spw_micros") / 1e6).as("syllables_per_word"),
        (col("flesch_nanos") / 1e9).as("flesch"),
        when(col("flesch_nanos") >= 90000000000L, "easy")
          .when(col("flesch_nanos") >= 60000000000L, "standard")
          .when(col("flesch_nanos") >= 30000000000L, "difficult")
          .otherwise("very_difficult").as("level"))
      .orderBy("doc_id")
  }

  val readabilitySql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(lower(text), ' '),
      |      w -> w != '')) AS BIGINT) AS n_words,
      |    GREATEST(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
      |      AS BIGINT)) AS n_sentences,
      |    GREATEST(1, CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
      |      AS BIGINT)) AS n_syllables
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_words, n_sentences, n_syllables,
      |    (2 * n_words * 1000000 + n_sentences) // (2 * n_sentences)
      |      AS wps_micros,
      |    (2 * n_syllables * 1000000 + n_words) // (2 * n_words)
      |      AS spw_micros
      |  FROM m WHERE n_words > 0),
      |f AS (
      |  SELECT *,
      |    206835000000 - 1015 * wps_micros - 84600 * spw_micros
      |      AS flesch_nanos
      |  FROM r)
      |SELECT doc_id, n_words, n_sentences, n_syllables,
      |  wps_micros / 1e6 AS words_per_sentence,
      |  spw_micros / 1e6 AS syllables_per_word,
      |  flesch_nanos / 1e9 AS flesch,
      |  CASE WHEN flesch_nanos >= 90000000000 THEN 'easy'
      |       WHEN flesch_nanos >= 60000000000 THEN 'standard'
      |       WHEN flesch_nanos >= 30000000000 THEN 'difficult'
      |       ELSE 'very_difficult' END AS level
      |FROM f
      |ORDER BY doc_id""".stripMargin

  /** CLASSIFIER CALIBRATION / RELIABILITY TABLE — the companion
    * diagnostic to [[classifierAuc]]: AUC says the score RANKS
    * positives above negatives; calibration says what a score LEVEL
    * means. Documents are bucketed into 10 fixed-width score bins over
    * the logit range [−1, 1] (micros grid, so binning is pure integer
    * arithmetic), and each bin reports its observed positive rate
    * (lang = 'en' ground truth) next to its mean score — a monotone
    * pos_rate column is a calibrated ranker; a flat one means the
    * threshold is meaningless. Same one-corpus-aggregate shape as the
    * AUC histogram: N docs collapse to ≤10 rows, every ratio by the
    * exact integer-micros idiom (mean score signed, rate nonneg), zero
    * order-sensitive floats.
    */
  def classifierCalibration(spark: SparkSession, dir: String): DataFrame = {
    val B = 4096
    Tables(spark, dir, "documents")
      .withColumn("words", expr("filter(split(lower(text), ' +'), w -> w != '')"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("logit_millis", hashedLogitMillis(B))
      .select(
        expr("""CASE WHEN logit_millis >= 0
                THEN (2 * logit_millis * 1000000 + n_words * 1000)
                       div greatest(2 * n_words * 1000, 1)
                ELSE -((2 * -logit_millis * 1000000 + n_words * 1000)
                       div greatest(2 * n_words * 1000, 1)) END""").as("score_micros"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .withColumn("bin",
        least(expr("(score_micros + 1000000) div 200000"), lit(9L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
        sum("score_micros").as("ssm"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("""CASE WHEN ssm >= 0 THEN (2 * ssm * 1000000 + n) div (2 * n)
                ELSE -((2 * -ssm * 1000000 + n) div (2 * n)) END
                / 1e12""").as("avg_score"),
        expr("(2 * n_pos * 1000000 + n) div (2 * n) / 1e6").as("pos_rate"))
      .orderBy("bin")
  }

  val classifierCalibrationSql: String = {
    val B = 4096
    s"""WITH d AS (
      |  SELECT lang,
      |    list_filter(string_split(lower(text), ' '), w -> w != '') AS words
      |  FROM documents),
      |s AS (
      |  SELECT CAST(len(words) AS BIGINT) AS n_words,
      |    CAST(COALESCE(list_sum(list_transform(words, w ->
      |      CAST(('0x' || substr(md5('w:' || CAST(
      |        CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $B
      |      AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000)), 0) AS BIGINT)
      |      AS logit_millis,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM d),
      |sc AS (
      |  SELECT CASE WHEN logit_millis >= 0
      |      THEN (2 * logit_millis * 1000000 + n_words * 1000)
      |             // greatest(2 * n_words * 1000, 1)
      |      ELSE -((2 * -logit_millis * 1000000 + n_words * 1000)
      |             // greatest(2 * n_words * 1000, 1)) END AS score_micros,
      |    CAST(pos AS BIGINT) AS pos
      |  FROM s),
      |binned AS (
      |  SELECT LEAST((score_micros + 1000000) // 200000, 9) AS bin,
      |    pos, score_micros
      |  FROM sc)
      |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(pos) AS BIGINT) AS n_pos,
      |  CASE WHEN SUM(score_micros) >= 0
      |    THEN (2 * CAST(SUM(score_micros) AS BIGINT) * 1000000
      |            + COUNT(*)) // (2 * COUNT(*))
      |    ELSE -((2 * -CAST(SUM(score_micros) AS BIGINT) * 1000000
      |            + COUNT(*)) // (2 * COUNT(*))) END / 1e12 AS avg_score,
      |  (2 * CAST(SUM(pos) AS BIGINT) * 1000000 + COUNT(*))
      |    // (2 * COUNT(*)) / 1e6 AS pos_rate
      |FROM binned
      |GROUP BY bin
      |ORDER BY bin""".stripMargin
  }

  val classifierAucSql: String = {
    val B = 4096
    s"""WITH d AS (
      |  SELECT lang,
      |    list_filter(string_split(lower(text), ' '), w -> w != '') AS words
      |  FROM documents),
      |s AS (
      |  SELECT CAST(len(words) AS BIGINT) AS n_words,
      |    CAST(COALESCE(list_sum(list_transform(words, w ->
      |      CAST(('0x' || substr(md5('w:' || CAST(
      |        CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % $B
      |      AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000)), 0) AS BIGINT)
      |      AS logit_millis,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |  FROM d),
      |sc AS (
      |  SELECT CASE WHEN logit_millis >= 0
      |      THEN (2 * logit_millis * 1000000 + n_words * 1000)
      |             // greatest(2 * n_words * 1000, 1)
      |      ELSE -((2 * -logit_millis * 1000000 + n_words * 1000)
      |             // greatest(2 * n_words * 1000, 1)) END AS score_micros,
      |    CAST(pos AS BIGINT) AS pos
      |  FROM s),
      |hist AS (
      |  SELECT score_micros, CAST(COUNT(*) AS BIGINT) AS c,
      |    CAST(SUM(pos) AS BIGINT) AS p
      |  FROM sc GROUP BY score_micros),
      |w AS (
      |  SELECT c, p, COALESCE(CAST(SUM(c) OVER (ORDER BY score_micros
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      |    AS cb
      |  FROM hist),
      |m AS (
      |  SELECT CAST(SUM(p) AS BIGINT) AS np,
      |    CAST(SUM(c - p) AS BIGINT) AS nn,
      |    CAST(SUM(p * (cb * 2 + c + 1)) AS BIGINT) AS s2
      |  FROM w)
      |SELECT np, nn,
      |  (2 * (s2 - np * (np + 1)) * 1000000 + 2 * np * nn)
      |    // (2 * 2 * np * nn) / 1e6 AS auc
      |FROM m""".stripMargin
  }

  /** The first BPE-training step under the driver gate: corpus-wide
    * adjacent-CHARACTER pair counts over word occurrences (lowercased,
    * whitespace-tokenized — the same token stream as
    * [[qualityClassifier]]), top-20 by count with a full tie order.
    * This is the statistic every merge round of [[bpeTrain]] recomputes;
    * registering it puts the hot loop's aggregation under the DuckDB
    * hash oracle while the iterative trainer is pinned by BpeSpec
    * against a reference implementation.
    */
  def bpeTopPairs(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .select(explode(expr("filter(split(lower(text), ' +'), w -> w != '')")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("pair")).limit(20)
  }

  val bpeTopPairsSql: String =
    """WITH w AS (
      |  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS w
      |  FROM documents),
      |p AS (
      |  SELECT unnest(list_transform(range(1, len(w)),
      |    i -> substr(w, CAST(i AS INT), 2))) AS pair
      |  FROM w WHERE len(w) >= 2)
      |SELECT pair, COUNT(*) AS n FROM p
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin

  /** Byte-pair-encoding TOKENIZER TRAINING, distributed (Sennrich et
    * al., arXiv:1508.07909): the classic algorithm runs on the WORD
    * FREQUENCY table, not the corpus — one corpus scan builds
    * (word, count, symbol array), then each merge round is an
    * aggregation over that vocabulary (thousands-to-millions of rows,
    * corpus-size-independent) plus one driver-side scalar (the winning
    * pair — the centroid-literal discipline: bounded metadata, never row
    * data). The greedy left-to-right within-word merge is a sequential
    * `aggregate` fold; per-round localCheckpoint keeps the iterated plan
    * a leaf exactly as the CC loop does. Ties break by pair string so
    * runs/engines/partitionings agree. Returns the merge list in order.
    */
  def bpeTrain(docs: DataFrame, merges: Int): Seq[(String, String)] =
    bpeTrainDetail(docs, merges).map { case (_, a, b, _) => (a, b) }

  /** [[bpeTrain]] with the full per-round record `(round, a, b, cnt)` —
    * the form the `bpe_train_merges` driver gate registers, so the
    * winning pair AND its corpus count are hash-checked every round.
    */
  def bpeTrainDetail(docs: DataFrame, merges: Int): Seq[(Int, String, String, Long)] = {
    val (detail, vocab) = bpeTrainState(docs, merges)
    graft.SparkUtil.release(vocab)
    detail
  }

  /** Trainer core returning the merge record AND the final vocabulary
    * state `(n, syms)` as an (eagerly checkpointed, NOT released)
    * DataFrame — the artifact [[bpeTokens]] counts tokens from. Callers
    * who don't keep the state must release it. */
  private def bpeTrainState(docs: DataFrame,
      merges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    var vocab = docs
      .select(explode(expr("filter(split(lower(text), ' +'), w -> w != '')")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("syms", expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .select("n", "syms")
      .localCheckpoint(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < merges && !exhausted) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
               i -> struct(syms[i-1] AS a, syms[i] AS b))""")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        out += ((round + 1, a, b, top(0).getLong(2)))
        val merged = lit(a + b)
        // EAGER checkpoint: the old vocab's blocks are released right
        // below, so the new round must be materialized first (a lazy
        // checkpoint would force against already-freed parent blocks —
        // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND)
        val next = vocab.withColumn("syms",
            org.apache.spark.sql.functions.aggregate(col("syms"),
              array().cast("array<string>"),
              (acc, s) => when(
                size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
                .otherwise(concat(acc, array(s)))))
          .localCheckpoint(true)
        graft.SparkUtil.release(vocab)
        vocab = next
        round += 1
      }
    }
    (out.toSeq, vocab)
  }

  /** Apply a trained BPE merge list ([[bpeTrain]]'s output, in training
    * order) to tokenize documents — a PURE PROJECTION: the merge table
    * compiles into the plan as one greedy in-word fold per merge (k
    * nested codegen'd HOFs, no shuffle, no vocabulary join), which is
    * the shape a 100 TB tokenization pass wants. Emits the token array
    * and count alongside the input columns. BpeSpec pins equality with
    * the reference encoder and the lossless-ness invariant (concat of
    * tokens == concat of characters).
    */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.{aggregate => aggFold, transform => hofTransform}
    val base = docs
      .withColumn("words", expr("filter(split(lower(text), ' +'), w -> w != '')"))
      .withColumn("seqs", expr(
        "transform(words, w -> transform(sequence(1, length(w)), i -> substring(w, i, 1)))"))
    val encoded = merges.foldLeft(col("seqs")) { case (c, (a, b)) =>
      hofTransform(c, s => aggFold(s, array().cast("array<string>"),
        (acc, t) => when(
          size(acc) > 0 && element_at(acc, -1) === lit(a) && t === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(t)))))
    }
    base
      .withColumn("tokens", flatten(encoded))
      .withColumn("n_bpe_tokens", size(col("tokens")))
      .drop("words", "seqs")
  }

  /** Rounds for the DRIVER-GATED BPE queries — small enough that the
    * oracle's k-stage CTE replay stays readable; BpeSpec pins deeper
    * runs against the reference encoder. */
  private val BpeGateRounds = 8

  /** Per-(JVM, corpus dir) memo of the gate-round training result —
    * the merge table is deterministic bounded metadata, so the two
    * gated consumers ([[bpeTrainMerges]], [[bpeTokens]]) train ONCE per
    * session, like [[ClusterIndex.forCorpus]] shares its CC fixpoint.
    */
  private val bpeMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(Int, String, String, Long)], DataFrame)]()

  /** A memoized DataFrame is only valid while its owning SparkContext
    * lives — a test suite (or CLI run) that stops the shared session
    * orphans the checkpointed blocks, and a later consumer collecting
    * the stale frame dies on a dead context. Rebuild on a fresh
    * session instead of returning the orphan. */
  private def memoFresh[V](memo: java.util.concurrent.ConcurrentHashMap[String, V],
      key: String, frameOf: V => DataFrame)(build: => V): V = {
    val cur = memo.get(key)
    if (cur != null && !frameOf(cur).sparkSession.sparkContext.isStopped) cur
    else { val fresh = build; memo.put(key, fresh); fresh }
  }

  private def gateTrained(spark: SparkSession,
      dir: String): (Seq[(Int, String, String, Long)], DataFrame) =
    memoFresh(bpeMemo, dir, (v: (Seq[(Int, String, String, Long)], DataFrame)) => v._2)(
      bpeTrainState(Tables(spark, dir, "documents"), BpeGateRounds))

  private def gateMerges(spark: SparkSession, dir: String): Seq[(Int, String, String, Long)] =
    gateTrained(spark, dir)._1

  /** [[bpeTrainDetail]] under the hard correctness gate: the trained
    * merge table `(round, a, b, cnt)`. The Spark side runs the
    * production trainer — per-round distributed pair aggregation + the
    * greedy in-word `aggregate` fold; the oracle replays training with
    * an INDEPENDENT formulation (space-joined symbol strings merged by
    * a left-to-right double-`replace` — two passes reach the greedy
    * fixpoint, because a pass-1 miss consumes nothing and so is never
    * adjacent to another miss). A hash match therefore pins, for every
    * round, the winning pair, its exact corpus count, and the
    * fold == string-replace greedy equivalence across engines. The
    * output is bounded trained metadata (k rows) — the
    * centroid-literal discipline, never row data.
    */
  def bpeTrainMerges(spark: SparkSession, dir: String): DataFrame = {
    val detail = gateMerges(spark, dir)
    spark.createDataFrame(detail.map { case (r, a, b, c) => (r.toLong, a, b, c) })
      .toDF("round", "a", "b", "cnt")
      .orderBy("round")
  }

  /** Corpus token frequencies after the [[BpeGateRounds]] learned
    * merges: the top-30 symbols of the trainer's FINAL VOCABULARY
    * STATE, weighted by word frequency — the artifact the training
    * loop already materializes round-by-round, read, never recomputed
    * (one training per session via the memo). The oracle independently
    * replays the whole training chain (double-replace greedy) and
    * counts ITS final state — a hash match pins every round's merge
    * application, not just the winning pairs. Two rejected forms, for
    * the record: corpus-wide [[bpeEncode]] measured 24 s at sf0.1
    * (k-nested interpreted folds over every word instance), and the
    * word-TYPE-table encode still paid ~13 s/run of OPTIMIZER time on
    * 31 rows — an 8-deep nested-lambda plan is quadratic to analyze
    * regardless of data size. The per-document projection encoder
    * stays BpeSpec-pinned against a reference implementation.
    */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val vocab = gateTrained(spark, dir)._2
    vocab.select(explode(col("syms")).as("token"), col("n"))
      .groupBy("token").agg(sum("n").as("cnt"))
      .orderBy(desc("cnt"), asc("token")).limit(30)
  }

  /** Shared oracle CTE chain: `v1` = the word-frequency table as padded
    * space-joined character strings; per round i, `p$i` pair counts,
    * `b$i` the winning pair (count desc, pair asc), `v${i+1}` the
    * double-replace greedy merge applied. */
  private def bpeOracleCtes(rounds: Int): String = {
    val v1 =
      """v1 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS w
        |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |                x -> x != '')) AS w
        |        FROM documents)
        |  GROUP BY 2)""".stripMargin
    val perRound = (1 to rounds).map { i =>
      s"""p$i AS (
         |  SELECT pr.a AS a, pr.b AS b, CAST(SUM(n) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT n, unnest(list_transform(range(1, len(l)),
         |      j -> struct_pack(a := l[j], b := l[j + 1]))) AS pr
         |    FROM (SELECT n, string_split(trim(w), ' ') AS l FROM v$i))
         |  GROUP BY pr.a, pr.b),
         |b$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1),
         |v${i + 1} AS (
         |  SELECT n, replace(replace(w,
         |      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
         |      ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS w
         |  FROM v$i, b$i)""".stripMargin
    }
    (v1 +: perRound).mkString("WITH ", ",\n", "")
  }

  val bpeTrainMergesSql: String = {
    val rows = (1 to BpeGateRounds).map(i =>
      s"SELECT CAST($i AS BIGINT) AS round, a, b, cnt FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""${bpeOracleCtes(BpeGateRounds)}
       |$rows
       |ORDER BY round""".stripMargin
  }

  val bpeTokensSql: String =
    s"""${bpeOracleCtes(BpeGateRounds)}
       |SELECT t AS token, CAST(SUM(n) AS BIGINT) AS cnt
       |FROM (SELECT n, unnest(string_split(trim(w), ' ')) AS t
       |      FROM v${BpeGateRounds + 1})
       |GROUP BY t
       |ORDER BY cnt DESC, token LIMIT 30""".stripMargin

  // ---------------------------------------------------------------------
  // UNIGRAM-LM tokenizer (SentencePiece-style), beside the BPE trainer:
  // the OTHER major subword family. BPE grows a vocabulary bottom-up by
  // merging frequent pairs; a unigram LM starts from a large seeded
  // candidate vocabulary and segments every word by VITERBI — the
  // minimum-cost split under per-piece costs −ln p(piece) — then
  // re-estimates piece probabilities from the segmentation (one hard-EM
  // round here; SentencePiece iterates and prunes, same structure).
  //
  // Determinism discipline (both engines, bit-identical): costs are
  // floor-at-6dp ln micros; the Viterbi DP carries ENCODED cells
  // cost·64 + backpointer (positions < 64 by the 60-char word cap), so
  // `array_min`/`MIN` breaks cost ties toward the SMALLEST backpointer
  // — i.e. the longest piece — with pure BIGINT comparisons. The oracle
  // replays seeding, DP (recursive CTE carrying the best-cost list) and
  // the backwalk independently in DuckDB.
  //
  // Scale shape: everything trains on the word-TYPE table (bounded
  // vocabulary, like the BPE trainer) — the corpus is touched once for
  // the type counts and once per registered consumer. The Viterbi DP is
  // IN-ROW HOF arithmetic per type (no join, no shuffle); only the
  // seeded vocabulary — bounded metadata: the alphabet + top-40
  // multi-char pieces — moves through the driver (the centroid-literal
  // discipline). Segmentations are memoized per (JVM, dir) and
  // checkpointed, exactly like the BPE gate's trained state.
  // ---------------------------------------------------------------------

  private val UniL = 6  // max candidate piece length
  private val UniM = 40 // top-M multi-char seed pieces (chars always kept)

  private def floorLnMicros(x: Long): Long =
    math.floor(math.log(x.toDouble) * 1000000).toLong

  /** Per-(JVM, dir) memo of the trained segmentation table
    * `(w, n, pieces)` — word types with frequencies and their Viterbi
    * split under the seeded unigram costs; eagerly checkpointed
    * (bounded: one row per word type). */
  private val unigramMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[ext] def unigramSegments(spark: SparkSession, dir: String): DataFrame =
    memoFresh(unigramMemo, dir, (v: DataFrame) => v) {
      val words = Tables(spark, dir, "documents")
        .select(explode(expr(
          "filter(split(lower(text), ' +'), w -> w != '')")).as("w"))
        .filter(length(col("w")) <= 60)
        .groupBy("w").agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // feeds seeding AND the DP below
      // seed scores: every substring occurrence of length 1..UniL,
      // weighted by word frequency (overlapping occurrences count)
      val occ = words
        .select(col("n"), explode(expr(
          s"""flatten(transform(sequence(1, length(w)),
                i -> transform(sequence(1, least($UniL, length(w) - i + 1)),
                  l -> substring(w, i, l))))""")).as("piece"))
        .groupBy("piece").agg(sum("n").as("score"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val chars = occ.filter(length(col("piece")) === 1)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val multi = occ.filter(length(col("piece")) >= 2)
        .orderBy(desc("score"), asc("piece")).limit(UniM)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      occ.unpersist()
      // initial cost −ln p = ln(total) − ln(score), floor micros: the
      // JVM's Math.log IS Spark's LN, and the 6dp floor is the repo's
      // accepted cross-engine ln discipline
      val seed = chars ++ multi
      val t = seed.map(_._2).sum
      val vocab = seed.map { case (p, s) =>
        (p, floorLnMicros(t) - floorLnMicros(s)) }
      val vmLit = map(vocab.flatMap { case (p, c) =>
        Seq(lit(p), lit(c)) }.toIndexedSeq: _*)
      words
        .withColumn("vm", vmLit)
        // Viterbi: best[i] encodes (min cost to segment w[1..i]) · 64 +
        // backpointer j; candidates are vocab pieces covering (j, i]
        .withColumn("dp", expr(
          s"""aggregate(sequence(1, length(w)), array(CAST(0 AS BIGINT)),
                (acc, i) -> concat(acc, array(
                  array_min(transform(
                    filter(sequence(greatest(0, i - $UniL), i - 1),
                      j -> map_contains_key(vm, substring(w, j + 1, i - j))),
                    j -> (acc[j] div 64 + vm[substring(w, j + 1, i - j)])
                         * 64 + CAST(j AS BIGINT))))))"""))
        // backwalk: prepend each head position's backpointer until 0
        .withColumn("pos", expr(
          """aggregate(sequence(1, length(w)),
               array(CAST(length(w) AS INT)),
               (acc, x) -> CASE WHEN acc[0] > 0
                 THEN concat(array(CAST(dp[acc[0]] % 64 AS INT)), acc)
                 ELSE acc END)"""))
        .withColumn("pieces", expr(
          """transform(sequence(0, size(pos) - 2),
               k -> substring(w, pos[k] + 1, pos[k + 1] - pos[k]))"""))
        // the WORDPIECE encoding of the same word under the same vocab:
        // greedy longest-match forward scan (BERT-style inference) —
        // positions grow by the longest vocab piece matching at the
        // head; single chars are always present, so it cannot stall
        .withColumn("wp_pos", expr(
          s"""aggregate(sequence(1, length(w)), array(0),
                (acc, x) -> CASE WHEN element_at(acc, -1) < length(w)
                  THEN concat(acc, array(element_at(acc, -1) +
                    array_max(filter(
                      sequence(1, least($UniL, length(w) - element_at(acc, -1))),
                      l -> map_contains_key(vm,
                        substring(w, element_at(acc, -1) + 1, l))))))
                  ELSE acc END)"""))
        .withColumn("wp_pieces", expr(
          """transform(sequence(0, size(wp_pos) - 2),
               k -> substring(w, wp_pos[k] + 1, wp_pos[k + 1] - wp_pos[k]))"""))
        .select("w", "n", "pieces", "wp_pieces")
        .localCheckpoint(true)
    }

  /** The unigram-LM VOCABULARY after one hard-EM round, under the hard
    * correctness gate: top-30 pieces by segmentation usage (frequency-
    * weighted over word types), with the re-estimated cost −ln p in
    * integer micros. The oracle independently replays seeding, the
    * encoded-cell Viterbi (recursive CTE), the backwalk, and the
    * usage re-estimate — a hash match pins every split decision of
    * every word type across engines.
    */
  def unigramLmVocab(spark: SparkSession, dir: String): DataFrame = {
    val segs = unigramSegments(spark, dir)
    val usage = segs
      .select(col("n"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("n").as("usage"))
    usage
      .crossJoin(broadcast(usage.agg(sum("usage").as("u"))))
      .select(col("piece"), col("usage"),
        expr("""CAST(FLOOR(LN(CAST(u AS DOUBLE)) * 1000000) AS BIGINT)
                - CAST(FLOOR(LN(CAST(usage AS DOUBLE)) * 1000000) AS BIGINT)""")
          .as("cost_micros"))
      .orderBy(desc("usage"), asc("piece")).limit(30)
  }

  /** Unigram tokenization statistics per document — the ENCODE path:
    * each document's words map to their type's memoized Viterbi
    * segmentation (a broadcast join against the bounded type table —
    * tokenizing never re-runs the DP per occurrence), yielding token
    * counts next to [[textStats]]' whitespace/BPE-regex counts.
    * Words over the 60-char training cap are excluded on both sides.
    */
  def unigramTokens(spark: SparkSession, dir: String): DataFrame = {
    val segs = unigramSegments(spark, dir)
      .select(col("w"), size(col("pieces")).cast("long").as("pcs"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(expr(
        "filter(split(lower(text), ' +'), w -> w != '')")).as("w"))
      .join(broadcast(segs), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("pcs").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** WORDPIECE tokenization statistics per document — the third
    * subword family beside [[bpeTokens]] (merge-trained) and
    * [[unigramTokens]] (Viterbi): BERT-style GREEDY LONGEST-MATCH
    * inference over the same seeded vocabulary, so the three
    * tokenizers are directly comparable on one corpus. Greedy picks
    * the longest vocab piece at each position (single chars always
    * present → the scan is total); unlike Viterbi it optimizes
    * nothing globally — the two genuinely disagree where two cheap
    * short pieces beat one long rare one, which is exactly what
    * [[tokenizerCompare]] surfaces. Same memoized segmentation
    * table, same broadcast-join encode path; UnigramSpec pins the
    * greedy scan against a reference implementation.
    */
  def wordpieceTokens(spark: SparkSession, dir: String): DataFrame = {
    val segs = unigramSegments(spark, dir)
      .select(col("w"), size(col("wp_pieces")).cast("long").as("pcs"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(expr(
        "filter(split(lower(text), ' +'), w -> w != '')")).as("w"))
      .join(broadcast(segs), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("pcs").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** TOKENIZER FERTILITY comparison per source — the readout a
    * pipeline owner uses to budget token counts: whitespace vs
    * unigram-LM vs wordpiece token totals for the same text, plus
    * chars-per-token (integer micros) under each subword scheme.
    * Sources with systematically high fertility (code, tables,
    * non-Latin scripts) are exactly where token budgets blow up.
    * One corpus pass for words (broadcast-joined to the memoized
    * segmentations), one for per-doc char counts; the rollup is
    * per-source.
    */
  def tokenizerCompare(spark: SparkSession, dir: String): DataFrame = {
    val segs = unigramSegments(spark, dir).select(col("w"),
      size(col("pieces")).cast("long").as("uni"),
      size(col("wp_pieces")).cast("long").as("wp"))
    val docs = Tables(spark, dir, "documents")
    val perDoc = docs
      .select(col("doc_id"), explode(expr(
        "filter(split(lower(text), ' +'), w -> w != '')")).as("w"))
      .join(broadcast(segs), Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ws"), sum("uni").as("uni"), sum("wp").as("wp"))
    perDoc
      .join(docs.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("chars")), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws").as("ws_tokens"),
        sum("uni").as("uni_tokens"),
        sum("wp").as("wp_tokens"),
        sum("chars").as("n_chars"))
      .select(col("source"), col("n_docs"), col("ws_tokens"),
        col("uni_tokens"), col("wp_tokens"),
        expr("(2 * n_chars * 1000000 + uni_tokens) div (2 * uni_tokens) / 1e6")
          .as("chars_per_uni"),
        expr("(2 * n_chars * 1000000 + wp_tokens) div (2 * wp_tokens) / 1e6")
          .as("chars_per_wp"))
      .orderBy("source")
  }

  /** Shared oracle chain through the segmentation table: words → seed
    * scores → vocab costs → match table → recursive encoded-cell DP →
    * recursive backwalk → `segs(w, n, pieces)`. */
  private val unigramOracleCtes: String =
    s"""WITH RECURSIVE
      |words AS (
      |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
      |                x -> x != '')) AS w
      |        FROM documents)
      |  WHERE length(w) <= 60
      |  GROUP BY w),
      |occ AS (
      |  SELECT substr(w, CAST(i AS INT), CAST(l AS INT)) AS piece,
      |    CAST(SUM(n) AS BIGINT) AS score
      |  FROM words,
      |    (SELECT unnest(range(1, 61)) AS i) pos,
      |    (SELECT unnest(range(1, ${UniL + 1})) AS l) len
      |  WHERE i + l - 1 <= length(w)
      |  GROUP BY 1),
      |chars AS (SELECT piece, score FROM occ WHERE length(piece) = 1),
      |multi AS (
      |  SELECT piece, score FROM occ WHERE length(piece) >= 2
      |  ORDER BY score DESC, piece LIMIT $UniM),
      |seed AS (SELECT * FROM chars UNION ALL SELECT * FROM multi),
      |tot AS (SELECT CAST(SUM(score) AS BIGINT) AS t FROM seed),
      |vocab AS (
      |  SELECT piece,
      |    CAST(FLOOR(LN(CAST(t AS DOUBLE)) * 1000000) AS BIGINT)
      |      - CAST(FLOOR(LN(CAST(score AS DOUBLE)) * 1000000) AS BIGINT)
      |      AS cost
      |  FROM seed CROSS JOIN tot),
      |m AS (
      |  SELECT w.w, CAST(j.j AS INT) + length(v.piece) AS i,
      |    CAST(j.j AS INT) AS j, v.cost
      |  FROM words w,
      |    (SELECT unnest(range(0, 60)) AS j) j,
      |    vocab v
      |  WHERE j.j + length(v.piece) <= length(w.w)
      |    AND substr(w.w, CAST(j.j AS INT) + 1, length(v.piece)) = v.piece),
      |dp AS (
      |  SELECT w, n, 0 AS i, [CAST(0 AS BIGINT)] AS best FROM words
      |  UNION ALL
      |  SELECT d.w, d.n, d.i + 1,
      |    list_append(d.best, (
      |      SELECT MIN((d.best[m.j + 1] // 64 + m.cost) * 64 + m.j)
      |      FROM m WHERE m.w = d.w AND m.i = d.i + 1))
      |  FROM dp d WHERE d.i < length(d.w)),
      |dpf AS (SELECT w, n, best FROM dp WHERE i = length(w)),
      |wb AS (
      |  SELECT w, n, CAST(length(w) AS INT) AS pos, best,
      |    CAST([] AS VARCHAR[]) AS pieces
      |  FROM dpf
      |  UNION ALL
      |  SELECT w, n, CAST(best[pos + 1] % 64 AS INT), best,
      |    list_prepend(substr(w, CAST(best[pos + 1] % 64 AS INT) + 1,
      |      pos - CAST(best[pos + 1] % 64 AS INT)), pieces)
      |  FROM wb WHERE pos > 0),
      |segs AS (SELECT w, n, pieces FROM wb WHERE pos = 0)""".stripMargin

  val unigramLmVocabSql: String =
    s"""$unigramOracleCtes,
      |usage AS (
      |  SELECT piece, CAST(SUM(n) AS BIGINT) AS usage
      |  FROM (SELECT n, unnest(pieces) AS piece FROM segs)
      |  GROUP BY piece),
      |ut AS (SELECT CAST(SUM(usage) AS BIGINT) AS u FROM usage)
      |SELECT piece, usage,
      |  CAST(FLOOR(LN(CAST(u AS DOUBLE)) * 1000000) AS BIGINT)
      |    - CAST(FLOOR(LN(CAST(usage AS DOUBLE)) * 1000000) AS BIGINT)
      |    AS cost_micros
      |FROM usage CROSS JOIN ut
      |ORDER BY usage DESC, piece LIMIT 30""".stripMargin

  val unigramTokensSql: String =
    s"""$unigramOracleCtes,
      |docwords AS (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
      |    x -> x != '')) AS w
      |  FROM documents)
      |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |  CAST(SUM(len(s.pieces)) AS BIGINT) AS n_tokens
      |FROM docwords d JOIN segs s ON d.w = s.w
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** Greedy longest-match (wordpiece) segmentation of the word types
    * under the same seeded vocab: a forward recursive pointer — each
    * step advances by the longest vocab piece matching at the head. */
  private val wordpieceCte: String =
    """wp AS (
      |  SELECT w, n, 0 AS pos, CAST([] AS VARCHAR[]) AS wp_pieces
      |  FROM words
      |  UNION ALL
      |  SELECT d.w, d.n,
      |    d.pos + (SELECT MAX(length(v.piece)) FROM vocab v
      |             WHERE v.piece = substr(d.w, d.pos + 1, length(v.piece))),
      |    list_append(d.wp_pieces, substr(d.w, d.pos + 1,
      |      (SELECT MAX(length(v.piece)) FROM vocab v
      |       WHERE v.piece = substr(d.w, d.pos + 1, length(v.piece)))))
      |  FROM wp d WHERE d.pos < length(d.w)),
      |wpsegs AS (SELECT w, n, wp_pieces FROM wp WHERE pos = length(w))""".stripMargin

  val wordpieceTokensSql: String =
    s"""$unigramOracleCtes,
      |$wordpieceCte,
      |docwords AS (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
      |    x -> x != '')) AS w
      |  FROM documents)
      |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
      |  CAST(SUM(len(s.wp_pieces)) AS BIGINT) AS n_tokens
      |FROM docwords d JOIN wpsegs s ON d.w = s.w
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  val tokenizerCompareSql: String =
    s"""$unigramOracleCtes,
      |$wordpieceCte,
      |docwords AS (
      |  SELECT doc_id, unnest(list_filter(string_split(lower(text), ' '),
      |    x -> x != '')) AS w
      |  FROM documents),
      |perdoc AS (
      |  SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS ws,
      |    CAST(SUM(len(u.pieces)) AS BIGINT) AS uni,
      |    CAST(SUM(len(p.wp_pieces)) AS BIGINT) AS wp
      |  FROM docwords d
      |  JOIN segs u ON d.w = u.w
      |  JOIN wpsegs p ON d.w = p.w
      |  GROUP BY d.doc_id),
      |rolled AS (
      |  SELECT doc.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(pd.ws) AS BIGINT) AS ws_tokens,
      |    CAST(SUM(pd.uni) AS BIGINT) AS uni_tokens,
      |    CAST(SUM(pd.wp) AS BIGINT) AS wp_tokens,
      |    CAST(SUM(length(doc.text)) AS BIGINT) AS n_chars
      |  FROM perdoc pd JOIN documents doc ON doc.doc_id = pd.doc_id
      |  GROUP BY doc.source)
      |SELECT source, n_docs, ws_tokens, uni_tokens, wp_tokens,
      |  (2 * n_chars * 1000000 + uni_tokens) // (2 * uni_tokens) / 1e6
      |    AS chars_per_uni,
      |  (2 * n_chars * 1000000 + wp_tokens) // (2 * wp_tokens) / 1e6
      |    AS chars_per_wp
      |FROM rolled
      |ORDER BY source""".stripMargin

  /** Text canonicalization — the normalization stage that runs in FRONT
    * of fingerprint dedup (without it, case/whitespace variants of the
    * same document get distinct md5s and survive exact dedup): lowercase,
    * strip non-printable-ASCII, collapse whitespace runs, trim. Emits
    * the normalized fingerprint and both lengths; a pure projection
    * (regex in the Java∩RE2 common subset so both engines agree
    * byte-for-byte, as in `pii_redact`).
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .withColumn("norm", trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^ -~]", ""), " +", " ")))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(col("norm")).cast("long").as("n_chars_norm"),
        md5(col("norm")).as("norm_fp"))
      .orderBy("doc_id")
  }

  val textNormalizeSql: String =
    """SELECT doc_id,
      |  LENGTH(text) AS n_chars_raw,
      |  LENGTH(norm) AS n_chars_norm,
      |  md5(norm) AS norm_fp
      |FROM (
      |  SELECT doc_id, text,
      |    TRIM(regexp_replace(
      |      regexp_replace(lower(text), '[^ -~]', '', 'g'), ' +', ' ', 'g')) AS norm
      |  FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** CCNet-style n-gram language-model perplexity filter (Wenzek et al.,
    * arXiv:1911.00359) — the OTHER pillar of published quality filtering
    * next to [[qualityClassifier]]'s fastText tier: train a word-bigram
    * LM with add-k smoothing on an in-domain reference slice (CCNet uses
    * target-language Wikipedia; here the `lang = 'en'` slice stands in),
    * then score EVERY document by its average negative log-likelihood —
    * low-perplexity ≈ fluent/in-domain, high-perplexity ≈ out-of-domain
    * or gibberish, and the keep cutoff is CCNet's head/tail split as one
    * trained constant. On the synthetic corpus the signal is real: `en`
    * docs score visibly below the other languages.
    *
    * Shapes for 100 TB: the LM is built in one training-slice scan (two
    * grouped counts); scoring is one corpus scan → per-doc distinct
    * bigram counts → ONE shuffle join against the bigram table (a
    * trained production LM is a bounded artifact — top-V vocabulary —
    * so that join collapses to a broadcast, exactly the
    * [[qualityClassifierWeighted]] weight-table pattern; the unigram
    * side is V rows and broadcasts here already). No driver-side state.
    *
    * Cross-engine float contract: every probability is computed in
    * EXPLICIT double arithmetic (no decimal-division ambiguity), each
    * bigram's −ln(P) is rounded to 6 dp and cast decimal(18,6) so the
    * per-doc sum is EXACT in any fold order (`sum_nll = Σ m·nll`), and
    * the only trailing float ops are one division and one `exp`, both
    * after rounding.
    */
  def lmPerplexity(spark: SparkSession, dir: String): DataFrame =
    lmPerplexityCore(Tables(spark, dir, "documents"), trainLang = "en",
      keepCutoff = 3.42)

  /** Parameterized core (LmPerplexitySpec trains on planted fluent text
    * and pins that gibberish scores strictly higher).
    */
  def lmPerplexityCore(docs: DataFrame, trainLang: String,
      keepCutoff: Double): DataFrame = {
    val toks = lmTokens(docs)
    val train = toks.filter(col("lang") === trainLang)
    val uni = train.select(explode(col("words")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val biTrain = lmBigramPairs(train, Seq.empty)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    lmScore(toks, uni, biTrain, keepCutoff)
  }

  private[ext] def lmTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      expr("filter(split(lower(text), ' +'), w -> w != '')").as("words"))

  /** In-order adjacent word pairs; docs with <2 words have no bigrams
    * and drop out of the score (same rule on the oracle side).
    */
  private[ext] def lmBigramPairs(df: DataFrame, keep: Seq[String]): DataFrame = df
    .filter(size(col("words")) >= 2)
    .select(keep.map(col) :+ explode(expr(
      "transform(sequence(0, size(words) - 2), " +
        "i -> named_struct('w1', words[i], 'w2', words[i + 1]))")).as("b"): _*)
    .select(keep.map(col) :+ col("b.w1") :+ col("b.w2"): _*)

  /** Scoring against an LM given as its two count tables — the ONE
    * dataflow behind both the inline query and [[LmModel]]'s persisted
    * artifact path (the `qualityScore` sharing contract: the production
    * form can never drift from the oracle-gated one).
    */
  private[ext] def lmScore(toks: DataFrame, uni: DataFrame, biTrain: DataFrame,
      keepCutoff: Double): DataFrame = {
    val docBi = lmBigramPairs(toks, Seq("doc_id", "lang"))
      .groupBy("doc_id", "lang", "w1", "w2").agg(count(lit(1)).as("m"))
    val vDf = uni.agg(count(lit(1)).as("v"))
    docBi
      .join(biTrain, Seq("w1", "w2"), "left")
      .join(broadcast(uni), Seq("w1"), "left")
      .crossJoin(broadcast(vDf))
      // add-k smoothing, k = 0.5: unseen bigram -> k/(c1 + kV); unseen
      // context -> 1/V. All-double on purpose (see float contract above)
      .withColumn("nll", expr(
        "cast(round(-ln((cast(coalesce(c2, 0) AS double) + 0.5) / " +
          "(cast(coalesce(c1, 0) AS double) + 0.5 * cast(v AS double))), 6) " +
          "AS decimal(18,6))"))
      .groupBy("doc_id", "lang")
      .agg(sum(col("m")).as("n_bigrams"),
        sum(col("nll") * col("m")).as("sum_nll"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        // 6dp mean in EXACT integer micros (half-away) — round(double/int)
        // ties on 2-5-smooth counts (n_bigrams=20 tied at sf0.1) and the
        // engines' rounding disagrees on ties; see qualityClassifier
        expr("""(2 * cast(sum_nll * 1000000 AS bigint) + n_bigrams)
                  div (2 * n_bigrams) / 1e6""").as("avg_nll"))
      .withColumn("ppl", round(exp(col("avg_nll")), 4))
      .withColumn("keep", col("avg_nll") <= keepCutoff)
      .orderBy("doc_id")
  }

  /** The artifact path under the driver gate: train [[LmModel]] into a
    * throwaway dir, score through the committed parquet tables, and
    * hash-match the SAME from-scratch DuckDB oracle — proof that
    * train→commit→load loses nothing. Eager checkpoint so the temp
    * model tree can be deleted before returning (the
    * `dedup_clusters_incremental` discipline: verify/bench loops must
    * not leak one artifact tree per invocation).
    */
  def lmPerplexityPersisted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val lmDir = java.nio.file.Files.createTempDirectory("graft-lm-").toString
    try {
      LmModel.train(docs, trainLang = "en", lmDir)
      LmModel.score(docs, lmDir, keepCutoff = 3.42).localCheckpoint(true)
    } finally graft.io.SegmentLog.deleteRecursively(lmDir)
  }

  val lmPerplexitySql: String =
    """WITH tok AS (
      |  SELECT doc_id, lang,
      |    list_filter(string_split(lower(text), ' '), x -> x != '') AS words
      |  FROM documents),
      |bi AS (
      |  SELECT doc_id, lang, words[i] AS w1, words[i + 1] AS w2
      |  FROM (SELECT doc_id, lang, words,
      |          unnest(generate_series(1, len(words) - 1)) AS i
      |        FROM tok WHERE len(words) >= 2)),
      |docbi AS (
      |  SELECT doc_id, lang, w1, w2, COUNT(*) AS m FROM bi GROUP BY 1, 2, 3, 4),
      |train AS (SELECT words FROM tok WHERE lang = 'en'),
      |uni AS (
      |  SELECT w1, COUNT(*) AS c1
      |  FROM (SELECT unnest(words) AS w1 FROM train) GROUP BY 1),
      |vv AS (SELECT COUNT(*) AS v FROM uni),
      |bitrain AS (
      |  SELECT w1, w2, COUNT(*) AS c2 FROM (
      |    SELECT words[i] AS w1, words[i + 1] AS w2
      |    FROM (SELECT words, unnest(generate_series(1, len(words) - 1)) AS i
      |          FROM train WHERE len(words) >= 2))
      |  GROUP BY 1, 2),
      |sc AS (
      |  SELECT doc_id, lang,
      |    CAST(SUM(m) AS BIGINT) AS n_bigrams,
      |    SUM(CAST(ROUND(-LN((CAST(COALESCE(c2, 0) AS DOUBLE) + 0.5) /
      |          (CAST(COALESCE(c1, 0) AS DOUBLE) + 0.5 * CAST(v AS DOUBLE))), 6)
      |        AS DECIMAL(18,6)) * m) AS sum_nll
      |  FROM docbi
      |  LEFT JOIN bitrain USING (w1, w2)
      |  LEFT JOIN uni USING (w1)
      |  CROSS JOIN vv
      |  GROUP BY 1, 2)
      |SELECT doc_id, lang, n_bigrams,
      |  (2 * CAST(sum_nll * 1000000 AS BIGINT) + n_bigrams)
      |    // (2 * n_bigrams) / 1e6 AS avg_nll,
      |  ROUND(EXP((2 * CAST(sum_nll * 1000000 AS BIGINT) + n_bigrams)
      |    // (2 * n_bigrams) / 1e6), 4) AS ppl,
      |  (2 * CAST(sum_nll * 1000000 AS BIGINT) + n_bigrams)
      |    // (2 * n_bigrams) / 1e6 <= 3.42 AS keep
      |FROM sc ORDER BY doc_id""".stripMargin

  /** Vocabulary heavy hitters through the mergeable Misra–Gries sketch
    * ([[graft.functions.HeavyHitters]]) — the frequency member of the
    * sketch rollup family (HLL distinct / GK quantile / Bloom
    * membership): per-SOURCE shard sketches built in one corpus pass,
    * merged to a global summary, then validated against the exact top-10
    * word counts. The registered form is the deterministic ENVELOPE
    * (exact ride-along + the theorem boolean, `assert_true`-backed);
    * the raw stored-counter estimates are order-dependent by nature and
    * stay in the unregistered `_raw` variant — the same contract as
    * `events_approx_users`/`events_quantile_weekly`.
    *
    * k = 16 is deliberately SMALLER than the corpus vocabulary so the
    * decrement/merge-subtraction paths genuinely run under the driver
    * gate; the guarantee est ≤ true ≤ est + error holds in any
    * partition/merge order (Misra–Gries 1982; Agarwal et al. PODS'12).
    * At 100 TB the per-source sketches are the bounded artifact a corpus
    * store keeps — coarser rollups merge bytes, never re-scan text.
    */
  def vocabHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    vocabHeavyHittersCore(spark, dir)
      .select(col("word"), col("n"), col("within_envelope"))
      .orderBy(col("n").desc, col("word"))

  /** Raw-estimate form (stored counter + error bound exposed;
    * order-dependent, hence unregistered).
    */
  def vocabHeavyHittersRaw(spark: SparkSession, dir: String): DataFrame =
    vocabHeavyHittersCore(spark, dir)
      .select(col("word"), col("n"), col("est"), col("err"))
      .orderBy(col("n").desc, col("word"))

  private def vocabHeavyHittersCore(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HeavyHitters._
    val toks = Tables(spark, dir, "documents")
      .select(col("source"),
        explode(expr("filter(split(lower(text), ' +'), w -> w != '')")).as("w"))
    val perSource = toks.groupBy("source").agg(mg_sketch_agg(col("w"), 16).as("sk"))
    val global = perSource.agg(mg_sketch_merge(col("sk")).as("sk"))
    val exactTop = toks.groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(10)
    exactTop.crossJoin(broadcast(global))
      .withColumn("est", mg_estimate(col("sk"), col("w")))
      .withColumn("err", mg_error(col("sk")))
      .withColumn("within_envelope",
        col("est") <= col("n") && col("n") <= col("est") + col("err"))
      .filter(expr(
        "assert_true(within_envelope, 'MG envelope violated') IS NULL"))
      .withColumnRenamed("w", "word")
  }

  val vocabHeavyHittersSql: String =
    """WITH tok AS (
      |  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x != '')) AS word
      |  FROM documents)
      |SELECT word, n, TRUE AS within_envelope FROM (
      |  SELECT word, COUNT(*) AS n FROM tok GROUP BY 1
      |  ORDER BY n DESC, word LIMIT 10)
      |ORDER BY n DESC, word""".stripMargin

  /** HEAPS'-LAW vocabulary-growth curve — V(T) ≈ K·T^β measured at
    * GEOMETRIC document checkpoints (after 2⁰, 2¹, … docs in doc_id
    * order): the corpus-planning readout behind [[zipfFit]]'s rank
    * curve ("how much new vocabulary does the next 10× of data buy").
    * Exactness: the checkpoint bucket of 1-based position p is
    * k = ⌈log₂ p⌉ computed via STRING LENGTH of the binary form
    * (length(bin(doc_id)) — no float log at bucket boundaries, same
    * function both engines); each word lands in the bucket of its
    * FIRST document (bucket is monotone in position, so min-bucket =
    * bucket-of-min). The per-checkpoint β = ln(V_k/V_{k−1}) /
    * ln(T_k/T_{k−1}) is the only double, rounded.
    *
    * Scale: one documents scan (persisted projection feeds the doc
    * rollup and the word explode), one vocabulary-sized min-aggregate;
    * checkpoints are LOG-bounded (≤ 64 buckets for any corpus that
    * fits in a BIGINT doc_id), so the cumulative self-joins are over
    * ≤ 64 broadcast rows — never a corpus-proportional window.
    */
  def heapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        expr("""CASE WHEN doc_id = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(length(bin(doc_id)) AS BIGINT) END""").as("k"),
        expr("CAST(size(split(text, ' ')) AS BIGINT)").as("n_tok"),
        split(col("text"), " ").as("words"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    val docb = docs.groupBy("k")
      .agg(count(lit(1)).as("nd"), sum("n_tok").as("nt"))
    val vocb = docs.select(col("k"), explode(col("words")).as("word"))
      .groupBy("word").agg(min("k").as("fk"))
      .groupBy("fk").agg(count(lit(1)).as("nw"))
    val ks = docb.select(col("k"))
    val cum = ks.join(broadcast(docb.select(col("k").as("k2"),
        col("nd"), col("nt"))), expr("k2 <= k"))
      .groupBy("k")
      .agg(sum("nd").as("docs_cum"), sum("nt").as("tokens_cum"))
    val cumv = ks.join(broadcast(vocb), expr("fk <= k"))
      .groupBy("k").agg(sum("nw").as("vocab_cum"))
    val full = cum.join(cumv, Seq("k"))
    val prev = full.select(col("k").as("pk"),
      col("tokens_cum").as("pt"), col("vocab_cum").as("pv"))
    full.join(broadcast(prev), expr("pk = k - 1"), "left")
      .select(col("k"), col("docs_cum"), col("tokens_cum"),
        col("vocab_cum"),
        when(col("pt").isNotNull && col("tokens_cum") > col("pt"),
          round(log(col("vocab_cum") / col("pv")) /
            log(col("tokens_cum") / col("pt")), 6)).as("beta"))
      .orderBy("k")
  }

  val heapsLawSql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id = 0 THEN CAST(0 AS BIGINT)
      |    ELSE CAST(length(bin(doc_id)) AS BIGINT) END AS k,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    string_split(text, ' ') AS words
      |  FROM documents),
      |docb AS (
      |  SELECT k, COUNT(*) AS nd, SUM(n_tok) AS nt FROM d GROUP BY 1),
      |w AS (SELECT k, unnest(words) AS word FROM d),
      |vocb AS (
      |  SELECT fk, COUNT(*) AS nw
      |  FROM (SELECT word, MIN(k) AS fk FROM w GROUP BY 1) GROUP BY 1),
      |cum AS (
      |  SELECT a.k, SUM(b.nd) AS docs_cum, SUM(b.nt) AS tokens_cum
      |  FROM docb a JOIN docb b ON b.k <= a.k GROUP BY 1),
      |cumv AS (
      |  SELECT a.k, SUM(v.nw) AS vocab_cum
      |  FROM docb a JOIN vocb v ON v.fk <= a.k GROUP BY 1),
      |f AS (SELECT * FROM cum JOIN cumv USING (k))
      |SELECT f.k, CAST(f.docs_cum AS BIGINT) AS docs_cum,
      |  CAST(f.tokens_cum AS BIGINT) AS tokens_cum,
      |  CAST(f.vocab_cum AS BIGINT) AS vocab_cum,
      |  CASE WHEN p.tokens_cum IS NOT NULL
      |        AND f.tokens_cum > p.tokens_cum THEN
      |    ROUND(LN(CAST(f.vocab_cum AS DOUBLE) / p.vocab_cum) /
      |          LN(CAST(f.tokens_cum AS DOUBLE) / p.tokens_cum), 6)
      |  END AS beta
      |FROM f LEFT JOIN f p ON p.k = f.k - 1
      |ORDER BY f.k""".stripMargin

  /** KNESER–NEY smoothed bigram probabilities (Kneser & Ney, ICASSP
    * 1995; Chen & Goodman 1998) — the LM-smoothing machinery beside
    * the raw-count [[lmPerplexity]] and the association-score
    * [[tokenPmi]]: absolute discounting with the CONTINUATION-count
    * backoff (a word's backoff mass reflects how many distinct
    * contexts it follows, not how often). With the discount the exact
    * rational d = ¾, the interpolated probability clears denominators
    * completely: P(w₂|w₁)·4·c(w₁)·B = max(4·c₁₂−3, 0)·B +
    * 3·N₁₊(w₁·)·N₁₊(·w₂) with B the distinct-bigram-type count — an
    * INTEGER numerator, so the top-20 readout is exact div-ppm and
    * nothing floats.
    *
    * Scale: one corpus pass to the bigram count table (Heaps-bounded),
    * two vocabulary-sized rollups (per-w₁ totals + continuation fanout,
    * per-w₂ continuation counts), one broadcast scalar, top-20 as
    * TakeOrdered.
    */
  def knBigramTop(spark: SparkSession, dir: String): DataFrame = {
    val bi = Tables(spark, dir, "documents")
      .select(split(lower(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """filter(transform(sequence(1, size(ws) - 1),
             i -> named_struct('a', ws[i-1], 'b', ws[i])),
           p -> p.a != '' AND p.b != '')""")).as("p"))
      .groupBy(col("p.a").as("w1"), col("p.b").as("w2"))
      .agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bi.count()
    val byW1 = bi.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1p_w1"))
    val byW2 = bi.groupBy("w2").agg(count(lit(1)).as("ncont_w2"))
    val types = bi.agg(count(lit(1)).as("bb"))
    bi.join(byW1, Seq("w1")).join(byW2, Seq("w2"))
      .crossJoin(broadcast(types))
      .withColumn("num", expr(
        """CAST(GREATEST(4 * c12 - 3, 0) AS DECIMAL(38,0)) * bb
          |+ 3 * CAST(n1p_w1 AS DECIMAL(38,0)) * ncont_w2""".stripMargin))
      .withColumn("p_ppm",
        expr("num * 1000000 div (4 * CAST(c1 AS DECIMAL(38,0)) * bb)"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1p_w1"), col("ncont_w2"),
        (col("p_ppm") / 1e6).as("p_kn"))
      .orderBy(desc("p_kn"), asc("w1"), asc("w2")).limit(20)
  }

  val knBigramTopSql: String =
    """WITH bi AS (
      |  SELECT p.a AS w1, p.b AS w2, CAST(COUNT(*) AS BIGINT) AS c12
      |  FROM (
      |    SELECT unnest(list_filter(
      |      list_transform(range(1, len(ws)),
      |        i -> struct_pack(a := ws[i], b := ws[i + 1])),
      |      p -> p.a != '' AND p.b != '')) AS p
      |    FROM (SELECT string_split(lower(text), ' ') AS ws FROM documents)
      |    WHERE len(ws) >= 2)
      |  GROUP BY 1, 2),
      |w1s AS (
      |  SELECT w1, CAST(SUM(c12) AS HUGEINT) AS c1,
      |    CAST(COUNT(*) AS HUGEINT) AS n1p_w1
      |  FROM bi GROUP BY 1),
      |w2s AS (
      |  SELECT w2, CAST(COUNT(*) AS HUGEINT) AS ncont_w2 FROM bi GROUP BY 1),
      |tt AS (SELECT CAST(COUNT(*) AS HUGEINT) AS bb FROM bi),
      |s AS (
      |  SELECT w1, w2, c12, c1, n1p_w1, ncont_w2,
      |    (GREATEST(4 * CAST(c12 AS HUGEINT) - 3, 0) * bb
      |     + 3 * n1p_w1 * ncont_w2) * 1000000 // (4 * c1 * bb) AS p_ppm
      |  FROM bi JOIN w1s USING (w1) JOIN w2s USING (w2) CROSS JOIN tt)
      |SELECT w1, w2, c12, CAST(c1 AS BIGINT) AS c1,
      |  CAST(n1p_w1 AS BIGINT) AS n1p_w1,
      |  CAST(ncont_w2 AS BIGINT) AS ncont_w2,
      |  p_ppm / 1e6 AS p_kn
      |FROM s
      |ORDER BY p_kn DESC, w1, w2
      |LIMIT 20""".stripMargin

  /** FIRST-FIT-DECREASING sequence packing — the packing-efficiency
    * upgrade over [[packChunks]]' greedy concat: within each 250-doc
    * stripe, documents (token counts capped at the 2048 context) are
    * sorted size-descending and placed into the FIRST bin with room,
    * opening a new bin otherwise — the classic FFD bound of 11/9·OPT
    * vs greedy's 2·OPT. The fold is a pure `aggregate` HOF over the
    * stripe's collected struct array: deterministic (order fixed by
    * (size DESC, doc_id)), replayed step-for-step by a recursive-CTE
    * oracle using the identical first-fit rule. Per stripe: bins used,
    * the ⌈tokens/2048⌉ lower bound, and the exact div-ppm fill factor.
    *
    * Scale: the stripe key (doc_id div 250) bounds every collected
    * array at 250 structs whatever the corpus size — stripes scale
    * OUT (one group per 250 docs), never UP; the per-stripe fold is
    * O(250·bins) inside codegen, no driver collect, no window.
    */
  def packBestFit(spark: SparkSession, dir: String): DataFrame = {
    val cap = 2048
    val stripe = 250
    Tables(spark, dir, "documents")
      .select(expr(s"doc_id div $stripe").as("stripe"),
        expr(s"LEAST(CAST(size(split(text, ' ')) AS BIGINT), $cap)")
          .as("s"),
        col("doc_id"))
      .groupBy("stripe")
      .agg(expr("array_sort(collect_list(struct(-s AS negs, doc_id, s)))")
        .as("ds"),
        count(lit(1)).as("n_docs"), sum("s").as("total_tokens"))
      .withColumn("bins", expr(
        s"""aggregate(ds, CAST(array() AS ARRAY<BIGINT>),
           |  (bins, e) -> CASE
           |    WHEN array_position(transform(bins, b -> b >= e.s), true) = 0
           |    THEN concat(bins, array(${cap}L - e.s))
           |    ELSE transform(bins, (b, i) -> IF(
           |      i = CAST(array_position(
           |            transform(bins, b2 -> b2 >= e.s), true) AS INT) - 1,
           |      b - e.s, b)) END)""".stripMargin))
      .select(col("stripe"), col("n_docs"), col("total_tokens"),
        expr("CAST(size(bins) AS BIGINT)").as("n_bins"),
        expr(s"(total_tokens + ${cap - 1}) div $cap").as("bound_bins"),
        (expr(s"total_tokens * 1000000 div (size(bins) * $cap)") / 1e6)
          .as("fill"))
      .orderBy("stripe")
  }

  val packBestFitSql: String =
    """WITH RECURSIVE d AS MATERIALIZED (
      |  SELECT doc_id // 250 AS stripe,
      |    LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), 2048) AS s,
      |    doc_id
      |  FROM documents),
      |numbered AS MATERIALIZED (
      |  SELECT stripe, s,
      |    ROW_NUMBER() OVER (PARTITION BY stripe ORDER BY s DESC, doc_id)
      |      AS k
      |  FROM d),
      |counts AS MATERIALIZED (
      |  SELECT stripe, CAST(COUNT(*) AS BIGINT) AS nd,
      |    CAST(SUM(s) AS BIGINT) AS tot
      |  FROM numbered GROUP BY 1),
      |rec(stripe, k, bins) AS (
      |  SELECT stripe, CAST(0 AS BIGINT), CAST([] AS BIGINT[]) FROM counts
      |  UNION ALL
      |  SELECT r.stripe, r.k + 1,
      |    CASE
      |      WHEN list_position(list_transform(r.bins, b -> b >= n.s), true) = 0
      |      THEN list_append(r.bins, 2048 - n.s)
      |      ELSE list_transform(r.bins, (b, i) -> CASE
      |        WHEN i = list_position(
      |               list_transform(r.bins, b2 -> b2 >= n.s), true)
      |        THEN b - n.s ELSE b END) END
      |  FROM rec r JOIN numbered n ON n.stripe = r.stripe AND n.k = r.k + 1)
      |SELECT c.stripe, c.nd AS n_docs, c.tot AS total_tokens,
      |  CAST(len(r.bins) AS BIGINT) AS n_bins,
      |  (c.tot + 2047) // 2048 AS bound_bins,
      |  (c.tot * 1000000 // (len(r.bins) * 2048)) / 1e6 AS fill
      |FROM rec r JOIN counts c ON c.stripe = r.stripe AND r.k = c.nd
      |ORDER BY c.stripe""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "vocab_heavy_hitters" -> ((vocabHeavyHitters _, vocabHeavyHittersSql)),
    "lm_perplexity" -> ((lmPerplexity _, lmPerplexitySql)),
    "lm_perplexity_persisted" -> ((lmPerplexityPersisted _, lmPerplexitySql)),
    "text_normalize" -> ((textNormalize _, textNormalizeSql)),
    "bpe_top_pairs" -> ((bpeTopPairs _, bpeTopPairsSql)),
    "bpe_train_merges" -> ((bpeTrainMerges _, bpeTrainMergesSql)),
    "ngram_novelty" -> ((ngramNovelty _, ngramNoveltySql)),
    "bpe_tokens" -> ((bpeTokens _, bpeTokensSql)),
    "unigram_lm_vocab" -> ((unigramLmVocab _, unigramLmVocabSql)),
    "unigram_tokens" -> ((unigramTokens _, unigramTokensSql)),
    "wordpiece_tokens" -> ((wordpieceTokens _, wordpieceTokensSql)),
    "tokenizer_compare" -> ((tokenizerCompare _, tokenizerCompareSql)),
    "quality_classifier" -> ((qualityClassifier _, qualityClassifierSql)),
    "classifier_auc" -> ((classifierAuc _, classifierAucSql)),
    "lift_curve" -> ((liftCurve _, liftCurveSql)),
    "confusion_matrix" -> ((confusionMatrix _, confusionMatrixSql)),
    "classifier_calibration" ->
      ((classifierCalibration _, classifierCalibrationSql)),
    "nb_lang_classify" -> ((nbLangClassify _, nbLangClassifySql)),
    "token_pmi" -> ((tokenPmi _, tokenPmiSql)),
    "keyword_textrank" -> ((keywordTextrank _, keywordTextrankSql)),
    "text_burstiness" -> ((textBurstiness _, textBurstinessSql)),
    "zipf_fit" -> ((zipfFit _, zipfFitSql)),
    "heaps_law" -> ((heapsLaw _, heapsLawSql)),
    "pack_best_fit" -> ((packBestFit _, packBestFitSql)),
    "kn_bigram_top" -> ((knBigramTop _, knBigramTopSql)),
    "char_entropy" -> ((charEntropy _, charEntropySql)),
    "boilerplate_detect" -> ((boilerplateDetect _, boilerplateDetectSql)),
    "readability" -> ((readability _, readabilitySql)),
    "text_stats" -> ((textStats _, textStatsSql)),
    "lang_id" -> ((langId _, langIdSql)),
    "doc_fingerprint" -> ((docFingerprint _, docFingerprintSql)),
    "train_test_split" -> ((trainTestSplit _, trainTestSplitSql)),
    "ngram_counts" -> ((ngramCounts _, ngramCountsSql)),
    "pack_chunks" -> ((packChunks _, packChunksSql)),
    "chunk_overlap" -> ((chunkOverlap _, chunkOverlapSql)),
    "quality_repetition" -> ((qualityRepetition _, qualityRepetitionSql)),
    "tfidf_top_terms" -> ((tfidfTopTerms _, tfidfTopTermsSql)),
    "tfidf_sim_pairs" -> ((tfidfSimPairs _, tfidfSimPairsSql)),
    "bm25_search" -> ((bm25Search _, bm25SearchSql)),
    "bm25_prf" -> ((bm25Prf _, bm25PrfSql)),
    "bm25_index_search" -> ((bm25IndexSearch _, bm25SearchSql))
  )

  /** `bm25_search` served from the PERSISTED inverted index
    * ([[SearchIndex]]): build once per JVM, then answer from the terms'
    * hash buckets only — the recurring-search path that never
    * re-tokenizes the corpus. Same oracle as the from-scratch form:
    * identical scoring tree, identical output contract.
    */
  def bm25IndexSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val loc = graft.SparkUtil.oncePerJvm("search-index", dir) { d =>
      SearchIndex.build(docs, d)
      ()
    }
    SearchIndex.search(spark, loc, bm25Terms, k = 20)
  }
}
