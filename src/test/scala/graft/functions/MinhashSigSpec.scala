package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the native [[MinhashSig]] against the HOF composite it fuses —
  * `array(array_min(transform(hs, h -> (a_i*h + b_i) % P)), ...)` for
  * the DedupQueries affine family a_i = 2i+3, b_i = 104729(i+1),
  * P = 2^31 − 1 — including the null/empty edge cases the composite
  * defines (null/empty input → array of k nulls; null elements skipped;
  * negative hashes follow Java remainder semantics).
  */
class MinhashSigSpec extends SparkSpec {

  private val K = 8
  private val P = 2147483647L
  private def hofSig: String = {
    val comps = (0 until K).map { i =>
      val (a, b) = (2 * i + 3L, 104729L * (i + 1))
      s"array_min(transform(hs, h -> ($a * h + $b) % $P))"
    }
    s"array(${comps.mkString(", ")})"
  }

  test("minhash_sig == array(array_min(transform(...))) on random arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // negative values included: upstream hashes are `x % P` of signed
    // 64-bit hashes, so components must follow Java remainder semantics
    val cases: Seq[Seq[Long]] =
      Seq(Seq(0L), Seq(P - 1), Seq(-5L, 5L)) ++
      (1 to 50).map(_ => (0 until (1 + rnd.nextInt(40)))
        .map(_ => rnd.nextLong() % P).toSeq)
    val df = cases.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }
      .toDF("id", "hs")
      .withColumn("nat", MinhashSig.minhash_sig(col("hs"), K))
      .withColumn("hof", expr(hofSig))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"id=${r.getLong(0)}")
    }
  }

  test("null/empty input -> array of k nulls; null elements skipped") {
    import spark.implicits._
    val df = Seq(
        (1L, Some(Seq[java.lang.Long]())),
        (2L, None: Option[Seq[java.lang.Long]]),
        (3L, Some(Seq[java.lang.Long](null, 42L, null))),
        (4L, Some(Seq[java.lang.Long](null, null))))
      .toDF("id", "hs")
      .withColumn("nat", MinhashSig.minhash_sig(col("hs"), K))
      .withColumn("hof", expr(hofSig))
    df.collect().foreach { r =>
      assert(r.getSeq[Any](2) == r.getSeq[Any](3), s"id=${r.getLong(0)}")
    }
    // the composite never returns a NULL array — neither may the native
    val nulls = df.filter(col("nat").isNull).count()
    assert(nulls == 0L)
  }

  test("real corpus parity over the fpSig hash pipeline") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("words", split(col("text"), " "))
      .withColumn("hs", when(size(col("words")) >= 3, transform(
        ShingleHashes.shingle_hashes(col("words"), 3),
        h => h % 2147483647L)))
      .filter(col("hs").isNotNull)
      .withColumn("nat", MinhashSig.minhash_sig(col("hs"), K))
      .withColumn("hof", expr(hofSig))
    assert(docs.filter(not(col("nat") === col("hof"))).count() == 0L)
    assert(docs.count() > 0L)
  }
}
