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

  test("native CdcEnds == HOF formulation on random/edge strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefgh \n.,!"
    val cases = Seq("", "a", "short", " " * 20, "é" * 30 + "abcdefgh" * 10,
      "日本語テキスト " * 12,
      // supplementary plane: 4-byte UTF-8, surrogate PAIRS in Java chars —
      // windows must count code points, not chars (offset-table path)
      "😀ab😁c " * 15) ++
      (1 to 40).map(_ => (0 until (1 + rnd.nextInt(400)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString) ++
      // real corpus text — the operator's own boundary density
      graft.Tables(spark, "/root/testdata/sf0.001", "documents")
        .orderBy("doc_id").select("text").limit(10)
        .collect().map(_.getString(0)).toSeq
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("len", length(col("text")).cast("int"))
      .withColumn("native", graft.functions.CdcEnds.cdc_ends(col("text")))
      .withColumn("hof", expr(
        """concat(
          |  filter(sequence(8, len),
          |    i -> i < len AND
          |      cast(conv(substring(md5(substring(text, i - 7, 8)), 1, 15),
          |                16, 10) AS bigint) % 64 = 0),
          |  array(len))""".stripMargin))
    val rows = df.select("doc_id", "native", "hof").collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"doc ${r.getLong(0)}: native ${r.getSeq[Int](1)} != hof ${r.getSeq[Int](2)}")
    }
    // at least one interior cut somewhere, or the parity check is vacuous
    assert(rows.exists(_.getSeq[Int](1).size > 1), "no interior cuts in fixtures")
  }

  test("fixed-offset chunking loses re-alignment on the same edit (contrast)") {
    val text = ('a' to 'z').mkString * 20
    def fixed(s: String) = s.grouped(64).toVector
    assert(fixed(text).drop(1) != fixed("Z" + text).drop(1),
      "fixed chunking unexpectedly re-aligned — contrast claim broken")
  }
}
