package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the phrase tier (ROUGE pairs, RAKE keywords) against
  * hand-computed values and the k-truss peel against an independent
  * in-memory peel of the same backbone.
  */
class PhraseGraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("rouge_pairs: hand pair with clipped unigram counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rouge").toString
    // doc0 "a b c b" vs doc1 "b b d": clipped unigram overlap =
    // min(2,2)=2 → recall 2/4 = 0.5, precision 2/3 = 0.666666 (floor
    // ppm); no bigram overlap
    Seq((0L, "s1", "a b c b"), (1L, "s1", "b b d"), (5L, "s2", "x y"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = rougeRow(dir)
    assert(got == Seq(("s1", 1L, 0.5, 0.666666, 0.0, 0.0)))
  }

  test("rouge_pairs: identical adjacent docs score 1.0 everywhere") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rouge1").toString
    Seq((0L, "s", "p q r"), (1L, "s", "p q r"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(rougeRow(dir) == Seq(("s", 1L, 1.0, 1.0, 1.0, 1.0)))
  }

  private def rougeRow(dir: String) = {
    import spark.implicits._
    PhraseQueries.rougePairs(spark, dir)
      .select("source", "n_pairs", "rouge1_recall", "rouge1_precision",
        "rouge2_recall", "rouge2_precision")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().toSeq.sortBy(_._1)
  }

  test("rake_keywords: hand document scores deg/freq exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rake").toString
    // stopwords 'the'/'of' split: phrases "red dog" and "red dog fox";
    // red: deg 5 freq 2 → 2.5; dog: 2.5; fox: deg 3 freq 1 → 3.0
    // → "red dog fox" = 8.0 > "red dog" = 5.0
    Seq((0L, "s", "the red dog of red dog fox"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PhraseQueries.rakeKeywords(spark, dir)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("red dog fox", 1L, 8.0), ("red dog", 1L, 5.0)))
  }

  test("jsd_sources: identical distributions score exactly 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("jsd0").toString
    // both sources carry the SAME text → each source distribution ==
    // the corpus distribution → every log ratio is ln 1 = 0 before
    // any truncation, so jsd must be exactly 0.0
    Seq((0L, "s1", "a b b c"), (1L, "s2", "a b b c"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PhraseQueries.jsdSources(spark, dir)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", 4L, 3L, 0.0), ("s2", 4L, 3L, 0.0)))
  }

  test("jsd_sources == independent ln-micros replica on sf0.001") {
    import spark.implicits._
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .as[(String, String)].collect()
    val cp = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val np = toks.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cq = toks.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val nq = toks.length.toLong
    def lnm(x: Double): Long = math.floor(math.log(x) * 1000000.0).toLong
    // exact replica of the defined semantics (floors + integer divs),
    // verified out-of-band against plain-double JSD to < 1.4e-6 on all
    // 20 sources — the engine value must match it EXACTLY
    val want = np.map { case (s, n) =>
      var sp = 0L; var sq = 0L; var vocab = 0L
      cq.foreach { case (w, cqw) =>
        val p0 = cp.getOrElse((s, w), 0L)
        val denom = lnm(p0.toDouble * nq + cqw.toDouble * n)
        if (p0 > 0) {
          sp += p0 * (lnm(2.0 * p0 * nq) - denom)
          vocab += 1
        }
        sq += cqw * (lnm(2.0 * cqw * n) - denom)
      }
      s -> ((n, vocab, ((sp / n + sq / nq) / 2) / 1e6))
    }
    val got = PhraseQueries.jsdSources(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(got.length == want.size)
    got.foreach { case (s, n, v, j) =>
      assert((n, v, j) == want(s), s"$s: got ($n,$v,$j) want ${want(s)}")
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-6)
    }
  }

  test("ngram_llr == brute-force Dunning G2 on sf0.001") {
    import spark.implicits._
    def lnm(x: Double): Long = math.floor(math.log(x) * 1000000.0).toLong
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
    val bigrams = texts.flatMap { t =>
      val ws = t.split(" ", -1)
      if (ws.length >= 2) ws.sliding(2).map(p => (p(0), p(1))).toSeq
      else Seq.empty
    }
    val c = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rx = bigrams.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cy = bigrams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val nn = bigrams.length.toLong
    def term(o: Long, rowcol: Double): Long =
      if (o > 0) o * (lnm(o.toDouble * nn) - lnm(rowcol)) else 0L
    val scored = c.toSeq.collect { case ((x, y), cxy) if cxy >= 5 =>
      val r = rx(x); val cc = cy(y)
      val g2m = 2 * (term(cxy, r.toDouble * cc)
        + term(r - cxy, r.toDouble * (nn - cc))
        + term(cc - cxy, (nn - r).toDouble * cc)
        + term(nn - r - cc + cxy, (nn - r).toDouble * (nn - cc)))
      (s"$x $y", cxy, g2m)
    }
    val want = scored.sortBy(t => (-t._3, t._1)).take(20)
      .map(t => (t._1, t._2, t._3 / 1e6))
    val got = PhraseQueries.ngramLlr(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(got == want, s"g2 mismatch:\n got $got\nwant $want")
  }

  test("k_truss profile == independent in-memory peel on sf0.001") {
    import spark.implicits._
    // rebuild the strongest-2000 backbone exactly as the query does
    val sp = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
    val backbone = sp.as("a").join(sp.as("b"), Seq("p"))
      .filter(col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("u"), col("b.s").as("v"))
      .agg(count(lit(1)).as("w"))
      .orderBy(desc("w"), asc("u"), asc("v")).limit(2000)
      .select(col("u").cast("long"), col("v").cast("long"))
      .as[(Long, Long)].collect().toSet
    // independent peel: support(u,v) = |N(u) ∩ N(v)|, drop < 2, 4 rounds
    def profile(es: Set[(Long, Long)]): (Long, Long) = {
      val nodes = es.flatMap(e => Seq(e._1, e._2))
      (es.size.toLong, nodes.size.toLong)
    }
    var es = backbone
    val want = Seq.newBuilder[(Long, Long, Long)]
    want += ((0L, profile(es)._1, profile(es)._2))
    for (r <- 1 to 4) {
      def nbrs(n: Long): Set[Long] =
        es.collect { case (u, v) if u == n => v
        case (u, v) if v == n => u }
      es = es.filter { case (u, v) => (nbrs(u) intersect nbrs(v)).size >= 2 }
      want += ((r.toLong, profile(es)._1, profile(es)._2))
    }
    val got = GraphQueries.kTruss(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == want.result(),
      s"k-truss profile mismatch: got $got want ${want.result()}")
    assert(got.head._2 > 0)
  }
}
