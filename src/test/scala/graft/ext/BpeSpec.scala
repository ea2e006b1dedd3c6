package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The distributed BPE trainer must produce exactly the merge sequence
  * of the classic sequential algorithm (Sennrich et al.): same pair
  * counts over the word-frequency table, same tie order, same greedy
  * left-to-right within-word merge.
  */
class BpeSpec extends SparkSpec {

  /** Reference implementation on a driver-side word-count map. */
  private def referenceBpe(words: Map[String, Long], merges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] =
      words.groupMapReduce(w => w._1.map(_.toString).toList)(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continueLoop = true
    while (out.size < merges && continueLoop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; Seq(a, b) <- syms.sliding(2) if syms.size >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + n
      if (counts.isEmpty) continueLoop = false
      else {
        val (pair, _) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        out += pair
        val (a, b) = pair
        vocab = vocab.groupMapReduce { case (syms, _) =>
          // greedy left-to-right non-overlapping merge
          val acc = scala.collection.mutable.ListBuffer.empty[String]
          for (s <- syms) {
            if (acc.nonEmpty && acc.last == a && s == b)
              acc(acc.size - 1) = a + b
            else acc += s
          }
          acc.toList
        }(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  test("distributed trainer == reference on a crafted corpus") {
    import spark.implicits._
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "wider wide wide low").toDF("text")
    val wordCounts = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(wordCounts, 8)
    val got = TextQueries.bpeTrain(docs, 8)
    assert(got == want, s"got $got\nwant $want")
    assert(got.size == 8)
  }

  test("distributed trainer == reference on real testdata") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("text")
    val wordCounts = docs
      .select(explode(expr("filter(split(lower(text), ' +'), w -> w != '')")).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(wordCounts, 5)
    val got = TextQueries.bpeTrain(docs, 5)
    assert(got == want, s"got $got\nwant $want")
  }

  /** Reference encoder: same greedy per-merge fold, sequential. */
  private def referenceEncode(word: String, merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(word.map(_.toString).toList) { case (syms, (a, b)) =>
      val acc = scala.collection.mutable.ListBuffer.empty[String]
      for (s <- syms) {
        if (acc.nonEmpty && acc.last == a && s == b) acc(acc.size - 1) = a + b
        else acc += s
      }
      acc.toList
    }

  test("bpeEncode applies trained merges exactly; tokens are lossless") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "new newer newest new wider wide")).toDF("doc_id", "text")
    val merges = TextQueries.bpeTrain(docs, 6)
    assert(merges.nonEmpty)
    val enc = TextQueries.bpeEncode(docs, merges)
      .orderBy("doc_id").collect()
    enc.foreach { r =>
      val text = r.getString(r.fieldIndex("text"))
      val tokens = r.getSeq[String](r.fieldIndex("tokens"))
      val want = text.toLowerCase.split(" +").filter(_.nonEmpty)
        .flatMap(w => referenceEncode(w, merges)).toSeq
      assert(tokens == want, s"doc ${r.getLong(0)}: $tokens vs $want")
      // lossless: token concat reconstructs the character stream
      assert(tokens.mkString == text.toLowerCase.split(" +").filter(_.nonEmpty).mkString)
      assert(r.getInt(r.fieldIndex("n_bpe_tokens")) == tokens.size)
    }
    // merges actually compress: fewer tokens than characters
    val n = enc.map(_.getInt(enc.head.fieldIndex("n_bpe_tokens"))).sum
    val chars = enc.map(r => r.getString(r.fieldIndex("text")).count(_ != ' ')).sum
    assert(n < chars)
  }

  test("encode is a zero-shuffle projection") {
    import spark.implicits._
    val docs = Seq((1L, "low lower lowest")).toDF("doc_id", "text")
    val plan = TextQueries.bpeEncode(docs, Seq(("l", "o"), ("lo", "w")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }

  test("merge exhaustion stops early instead of looping") {
    import spark.implicits._
    val docs = Seq("a b c").toDF("text") // single-char words: no pairs
    assert(TextQueries.bpeTrain(docs, 4) == Seq.empty)
  }
}
