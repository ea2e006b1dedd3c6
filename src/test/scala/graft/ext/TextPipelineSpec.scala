package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The stability claims the split/pack operators make: assignments are a
  * pure function of the data, not of the physical layout.
  */
class TextPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("train/test split is stable under repartitioning and ~80/10/10") {
    val a = TextQueries.trainTestSplit(spark, dir)
    val n = a.count()
    // recompute on a differently-partitioned session view: identical rows
    val b = TextQueries.trainTestSplit(spark, dir).repartition(7)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val frac = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("valid") > 0.04 && frac("valid") < 0.16)
    assert(frac("test") > 0.04 && frac("test") < 0.16)
  }

  test("pii_redact plants, counts, and strips every planted identifier") {
    val r = CurationQueries.piiRedact(spark, dir).persist()
    // every 7th doc carries exactly one of each; all others none
    assert(r.filter(col("doc_id") % 7 === 0)
      .filter(col("n_emails") =!= 1 || col("n_ips") =!= 1 || col("n_phones") =!= 1)
      .count() == 0L)
    assert(r.filter(col("doc_id") % 7 =!= 0)
      .filter(col("n_emails") + col("n_ips") + col("n_phones") =!= 0)
      .count() == 0L)
    // redaction is idempotent: planted and unplanted rows both end PII-free
    // (fingerprints of a doc and its planted twin differ, so the mask ran)
    val planted = r.filter(col("doc_id") % 7 === 0).count()
    assert(planted > 0)
    r.unpersist()
  }

  test("quality_repetition fractions are in range and verdict matches them") {
    val q = TextQueries.qualityRepetition(spark, dir).persist()
    assert(q.filter(col("dup_word_frac") < 0 || col("dup_word_frac") > 1
      || col("top_word_frac") <= 0 || col("top_word_frac") > 1
      || col("dup_bigram_frac") < 0 || col("dup_bigram_frac") > 1).count() == 0L)
    val mislabelled = q.filter(
      (col("dup_word_frac") > 0.75 || col("top_word_frac") > 0.2
        || col("dup_bigram_frac") > 0.3) =!= (col("verdict") === "repetitive"))
    assert(mislabelled.count() == 0L)
    q.unpersist()
  }

  test("corpus_curation applies exactly the text_stats quality score") {
    // the score is one shared definition (TextQueries.qualityScore) —
    // this pins the composition so a drift in either query fails loudly
    val cur = CurationQueries.corpusCuration(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    val stats = TextQueries.textStats(spark, dir)
      .select(col("doc_id"), col("quality_score").as("qs"))
    val diff = cur.join(stats, Seq("doc_id"))
      .filter(col("quality_score") =!= col("qs"))
    assert(diff.count() == 0L)
  }

  test("tfidf ranks are dense, scores descend, and universal words score 0") {
    val t = TextQueries.tfidfTopTerms(spark, dir).persist()
    val nDocs = graft.Tables(spark, dir, "documents").count()
    // ranks are 1..k dense per doc: max rank == row count per doc
    val bad = t.groupBy("doc_id")
      .agg(max("rank").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n") || col("n") > 5)
    assert(bad.count() == 0L)
    // scores never increase with rank within a doc
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("rank")
    assert(t.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
      .count() == 0L)
    // idf zero ⟺ the word occurs in every document
    assert(t.filter(col("df") === nDocs && col("score") =!= 0.0).count() == 0L)
    t.unpersist()
  }

  test("pack_chunks offsets are contiguous within each shard") {
    val p = TextQueries.packChunks(spark, dir).persist()
    // within a shard, tok_offset of doc k+1 == tok_offset + n_tokens of k
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val gaps = p.withColumn("next_off", lead(col("tok_offset"), 1).over(w))
      .filter(col("next_off").isNotNull &&
        col("next_off") =!= col("tok_offset") + col("n_tokens"))
    assert(gaps.count() == 0L)
    // chunk ids never collide across shards (shard-prefixed)
    val cross = p.groupBy("chunk_id").agg(countDistinct("shard").as("s"))
      .filter(col("s") > 1)
    assert(cross.count() == 0L)
    p.unpersist()
  }

  test("shuffle_shard: dense per-shard positions, stable, all docs exactly once") {
    val r = CurationQueries.shuffleShard(spark, dir).persist()
    val n = r.count()
    assert(r.select("doc_id").distinct().count() == n) // every doc once
    // positions are 1..count(shard) dense within each shard
    val bad = r.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.count() == 0L)
    // pure function of the data: identical under repartitioning
    val b = CurationQueries.shuffleShard(spark, dir).repartition(7)
    assert(r.except(b).isEmpty && b.except(r).isEmpty)
    r.unpersist()
  }

  test("source_mix caps every source at the median token budget") {
    val m = CurationQueries.sourceMix(spark, dir).persist()
    val rows = m.collect()
    // rates in (0, 1]; budget never exceeds tokens; at least one source
    // is kept whole (the median source itself has rate 1.0)
    assert(rows.forall(r => r.getAs[Double]("sample_rate") > 0.0
      && r.getAs[Double]("sample_rate") <= 1.0))
    assert(rows.forall(r => r.getAs[Long]("token_budget") <= r.getAs[Long]("n_tokens")))
    assert(rows.exists(r => r.getAs[Double]("sample_rate") == 1.0))
    m.unpersist()
    spark.catalog.clearCache() // releases sourceMix's INTERNAL rollup persist
  }

  test("source_temperature: sub-rounding share gets NULL boost, q still ranks") {
    import spark.implicits._
    // web holds ~10M tokens, the curated source 1: its share rounds to
    // p = 0.000000 at 6dp — the zero-divisor edge the fixture corpus
    // can't reach (Spark NULL vs DuckDB NaN would diverge un-guarded)
    val rollup = Seq(
      ("web", 1000L, 10000000L),
      ("books", 100L, 2000000L),
      ("curated", 1L, 1L)).toDF("source", "n_docs", "n_tokens")
    val out = CurationQueries.sourceTemperatureFrom(rollup)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("curated").getDouble(3) == 0.0)   // p rounds to zero
    assert(out("curated").isNullAt(5))           // boost: explicit NULL
    assert(out("curated").getDouble(4) >= 0.0)   // q defined regardless
    assert(out("web").getDouble(5) > 0.0)        // normal source: real boost
    // smoothing direction: the dominant source is damped (q < p)
    assert(out("web").getDouble(4) < out("web").getDouble(3))
  }

  test("pack_best_fit == reference FFD; beats the greedy-concat bound") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ffd").toString
    val rnd = new scala.util.Random(5)
    val sizes = Vector.fill(40)(1 + rnd.nextInt(2000))
    val docs = sizes.zipWithIndex.map { case (s, i) =>
      (i.toLong, Seq.fill(s)("w").mkString(" ")) // exactly s tokens
    }
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // reference FFD over (size desc, doc_id) with cap 2048
    def ffd(ss: Seq[Long]): Int = {
      val bins = scala.collection.mutable.ArrayBuffer[Long]()
      ss.foreach { s =>
        bins.indexWhere(_ >= s) match {
          case -1 => bins += 2048L - s
          case i  => bins(i) -= s
        }
      }
      bins.length
    }
    val ordered = sizes.zipWithIndex
      .sortBy { case (s, i) => (-s, i) }.map(_._1.toLong)
    val row = TextQueries.packBestFit(spark, tmp)
      .select("n_docs", "total_tokens", "n_bins", "bound_bins")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row._1 == 40 && row._2 == sizes.map(_.toLong).sum)
    assert(row._3 == ffd(ordered).toLong, s"bins ${row._3}")
    assert(row._3 >= row._4) // never below the capacity lower bound
  }

  test("Kneser-Ney probabilities == hand rationals on a crafted corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("kn").toString
    // bigrams: (a,b)×2, (a,c)×1 → B=2; c(a)=3, N1+(a·)=2,
    // N1+(·b)=N1+(·c)=1; with d=¾:
    //   P(b|a) = (5·2 + 3·2·1)/(4·3·2) = 16/24 → ppm 666666
    //   P(c|a) = (1·2 + 6)/24        =  8/24 → ppm 333333
    Seq((0L, "a b"), (1L, "a b"), (2L, "a c"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.knBigramTop(spark, tmp)
      .select("w1", "w2", "p_kn").as[(String, String, Double)]
      .collect().toList
    assert(got == List(("a", "b", 0.666666), ("a", "c", 0.333333)))
    spark.catalog.clearCache()
  }

  test("heaps_law checkpoints == hand values on a crafted corpus") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("heaps").toString
    // buckets: doc0→k0, doc1→k1, docs 2-3→k2
    // vocab: k0 {a,b}=2, k1 +{c}=3, k2 +{d}=4; tokens cum 2,4,8
    Seq((0L, "a b"), (1L, "a c"), (2L, "c d"), (3L, "a b"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.heapsLaw(spark, tmp)
      .select("k", "docs_cum", "tokens_cum", "vocab_cum", "beta")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toList
    def b(v2: Double, v1: Double, t2: Double, t1: Double) =
      BigDecimal(math.log(v2 / v1) / math.log(t2 / t1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == List(
      (0L, 1L, 2L, 2L, None),
      (1L, 2L, 4L, 3L, Some(b(3, 2, 4, 2))),
      (2L, 4L, 8L, 4L, Some(b(4, 3, 8, 4)))))
  }
}
