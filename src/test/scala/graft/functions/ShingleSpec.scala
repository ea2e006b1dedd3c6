package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the native [[ShingleHashes]] against the HOF formulation it
  * replaces — per-window md5h60 of space-joined word n-grams, plus the
  * fused first-seen-order distinct (= `array_distinct` over the same).
  */
class ShingleSpec extends SparkSpec {

  test("shingle_hashes == transform(sequence..., md5h60(concat_ws(slice))) incl. distinct") {
    import spark.implicits._
    Md5Prefix60.register(spark)
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "bb", "ccc", "déjà", "x y", "", "zz")
    val cases: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("one"), Seq("one", "two"),
        Seq("r", "e", "p", "r", "e", "p")) ++
      (1 to 40).map(_ => (0 until rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.size))))
    for (n <- Seq(1, 3, 5)) {
      val df = cases.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
        .toDF("id", "words")
        .withColumn("nat", ShingleHashes.shingle_hashes(col("words"), n))
        .withColumn("natd", ShingleHashes.shingle_hashes(col("words"), n, distinct = true))
        .withColumn("hof", expr(
          s"""CASE WHEN size(words) >= $n THEN
                transform(sequence(1, size(words) - $n + 1),
                  i -> md5h60(concat_ws(' ', slice(words, i, $n))))
              ELSE array() END"""))
      df.collect().foreach { r =>
        assert(r.getSeq[Long](2) == r.getSeq[Long](4), s"n=$n id=${r.getLong(0)}")
        assert(r.getSeq[Long](3) == r.getSeq[Long](4).distinct, s"distinct n=$n id=${r.getLong(0)}")
      }
    }
  }

  test("null ELEMENTS are skipped like concat_ws — no NPE") {
    import spark.implicits._
    Md5Prefix60.register(spark)
    // split() never yields null elements, but the declared input type
    // (array<string> nullable-element) admits them from other callers:
    // the contract is concat_ws's null-skipping, pinned against the HOF
    val df = Seq(
        (1L, Seq[String]("a", null, "b", "c")),
        (2L, Seq[String](null, null)),
        (3L, Seq[String]("x", null)))
      .toDF("id", "words")
      .withColumn("nat", ShingleHashes.shingle_hashes(col("words"), 2))
      .withColumn("hof", expr(
        """transform(sequence(1, size(words) - 1),
             i -> md5h60(concat_ws(' ', slice(words, i, 2))))"""))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](2) == r.getSeq[Long](3), s"id=${r.getLong(0)}")
    }
  }

  test("null in, null out; real corpus parity at n=3") {
    import spark.implicits._
    Md5Prefix60.register(spark)
    val nr = Seq[Option[Seq[String]]](None).toDF("words")
      .select(ShingleHashes.shingle_hashes(col("words"), 3)).head()
    assert(nr.isNullAt(0))
    val bad = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("words", split(col("text"), " "))
      .withColumn("nat", ShingleHashes.shingle_hashes(col("words"), 3))
      .withColumn("hof", expr(
        """CASE WHEN size(words) >= 3 THEN
             transform(sequence(1, size(words) - 2),
               i -> md5h60(concat_ws(' ', slice(words, i, 3))))
           ELSE array() END"""))
      .filter(not(col("nat") === col("hof")))
      .count()
    assert(bad == 0L)
  }
}
