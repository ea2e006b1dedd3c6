package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the property content-defined chunking EXISTS for: boundaries
  * depend only on local window content, so edits re-align. Fixed-offset
  * chunking (chunk_overlap) loses every downstream chunk after a
  * single-byte prefix insertion; CDC must recover all chunks after the
  * first boundary.
  */
class CdcSpec extends SparkSpec {

  private def carve(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    DedupQueries.cdcCarve(rows.toDF("doc_id", "text"))
      .select(col("doc_id"), col("chunk"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
  }

  test("prefix insertion re-aligns: all chunks after the first boundary survive") {
    // real corpus text so the boundary density is the operator's own
    val base = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .orderBy("doc_id").select("text").limit(5)
      .collect().map(_.getString(0)).mkString(" ")
    assert(base.length > 300, "fixture text too short to carve")
    val shifted = "Z" + base
    val chunks = carve(Seq((1L, base), (2L, shifted)))
    val (orig, shift) = (chunks(1L), chunks(2L))
    // chunks must reconstruct the inputs losslessly
    assert(orig.mkString == base && shift.mkString == shifted)
    // the carve must actually cut (otherwise the test is vacuous)
    assert(orig.size >= 3, s"only ${orig.size} chunks — raise fixture size")
    // shift-resistance: identical after the first boundary on each side
    assert(orig.tail == shift.tail,
      "downstream chunks did not re-align after a 1-char prefix edit")
    // and the first chunks differ only by the inserted prefix
    assert(shift.head == "Z" + orig.head)
  }

  test("fixed-offset chunking loses re-alignment on the same edit (contrast)") {
    val text = ('a' to 'z').mkString * 20
    def fixed(s: String) = s.grouped(64).toVector
    assert(fixed(text).drop(1) != fixed("Z" + text).drop(1),
      "fixed chunking unexpectedly re-aligned — contrast claim broken")
  }
}
