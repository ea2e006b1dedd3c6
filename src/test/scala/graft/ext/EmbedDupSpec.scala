package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The embedding near-dup operator (`embed_dup_pairs`) generates its
  * candidates via SRP-LSH banding. This spec keeps the retired
  * label-blocked all-pairs form — O(n²/cells) compare volume plus an
  * unbounded corpus-side broadcast, fine as a demo, fatal at 100 TB — as
  * a FIXTURE to measure the LSH operator against:
  *
  *  - precision 1.0: every emitted pair really has cosine ≥ threshold
  *    (subset of the exhaustive all-pairs ground truth);
  *  - recall floor: SRP collision math says a ≥0.35-cosine pair (≈69°,
  *    per-bit agreement ~0.62) collides in any of 4 4-bit bands with
  *    p ≈ 46%; at a production near-dup threshold (cos ≥ 0.9) the same
  *    geometry gives ~96%. The demo threshold is deliberately weak, so
  *    the floor asserted here is loose — the point is the fixture
  *    documents the trade, not that 0.35 is a good dedup knob.
  */
class EmbedDupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def groundTruth = {
    val e = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("v_b"))
    e.select(col("vec_id").as("vec_a"), col("v").as("v_a"))
      .join(b, col("vec_a") < col("vec_b")) // exhaustive all-pairs: fixture only
      .withColumn("cos", round(SimilarityQueries.cosineExpr("v_a", "v_b"), 6))
      .filter(col("cos") >= 0.35)
      .select("vec_a", "vec_b", "cos")
  }

  test("LSH near-dup pairs are a subset of exhaustive ground truth (precision 1)") {
    val got = DedupQueries.embedDupPairs(spark, dir)
      .select("vec_a", "vec_b", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val truth = groundTruth
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(truth.nonEmpty, "fixture needs at least one near pair")
    val wrong = got -- truth
    assert(wrong.isEmpty, s"pairs not in exhaustive ground truth: $wrong")
    // recall: loose floor at the deliberately-weak demo threshold
    val recall = got.size.toDouble / truth.size
    assert(recall >= 0.2, s"LSH recall $recall below floor (got ${got.size} of ${truth.size})")
    spark.catalog.clearCache()
  }

  test("retired label-blocked form = ground truth restricted to equal labels") {
    val e = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val a = e.select(col("vec_id").as("vec_a"), col("label"), col("v").as("v_a"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"), col("v").as("v_b"))
    // the retired registered form, verbatim: label-blocked broadcast join
    val blocked = a.repartition(col("vec_a"))
      .join(broadcast(b), Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos0", SimilarityQueries.cosineExpr("v_a", "v_b"))
      .select(col("vec_a"), col("vec_b"),
        explode(expr("filter(array(round(cos0, 6)), c -> c >= 0.35)")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val labels = e.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val sameLabelTruth = groundTruth
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (x, y, _) => labels(x) == labels(y) }.toSet
    assert(blocked == sameLabelTruth)
  }
}
