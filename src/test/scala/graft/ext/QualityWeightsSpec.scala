package graft.ext

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The trained-weights classifier path must be the SAME inference as the
  * oracle-gated hashed query when fed the hashed table as weights — the
  * proof that swapping in real trained floats changes only the numbers,
  * not the dataflow.
  */
class QualityWeightsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val B = 4096

  /** The md5 pseudo-weight table the hashed query computes per token,
    * materialized once per bucket id (integer millis, exact in double).
    */
  private def hashedTable: Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until B).map { j =>
      val hex = md.digest(s"w:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 2001 - 1000).toDouble
    }.toArray
  }

  test("weighted path with the hashed table == the oracle-gated query") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    // compare the EXACT columns: doc identity, token count, the raw sum
    // (integer millis — exact in doubles), and the keep decision; the
    // rounded display logit differs only by the millis scale convention
    val weighted = TextQueries.qualityClassifierWeighted(docs, hashedTable)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(4)))
    val hashed = TextQueries.qualityClassifier(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toDouble, r.getBoolean(4)))
    assert(weighted.nonEmpty)
    assert(weighted.toSeq == hashed.toSeq)
  }

  test("weights survive a file round-trip and real floats change only numbers") {
    val f = Files.createTempFile("weights-", ".txt")
    val tbl = hashedTable.map(_ / 1000.0) // plausibly-scaled trained floats
    Files.writeString(f, tbl.mkString("\n"))
    val loaded = TextQueries.loadWeights(spark, f.toString)
    assert(loaded.toSeq == tbl.toSeq)
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val out = TextQueries.qualityClassifierWeighted(docs, loaded)
      .orderBy("doc_id").limit(3).collect()
    assert(out.nonEmpty && out.forall(!_.isNullAt(3)))
  }

  test("inference is a zero-shuffle projection") {
    val docs = graft.Tables(spark, dir, "documents").select("doc_id", "text")
    val plan = TextQueries.qualityClassifierWeighted(docs, hashedTable)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
  }
}
