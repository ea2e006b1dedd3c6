package graft.ext

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** spark.ml interop: the library MinHashLSH path over the same word sets,
  * cross-validated against the exact Jaccard operator (`jaccard_pairs`'
  * semantics). Shows the two near-dup implementations agree on strong
  * pairs: every exact-Jaccard≥0.8 pair must be found by the LSH join at
  * distance ≤ 0.2 given enough hash tables (recall property, seeded so
  * the test is stable).
  */
class MlLshSpec extends SparkSpec {

  test("ml MinHashLSH approxSimilarityJoin finds the exact-Jaccard pairs") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 150)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("words"))

    val tf = new HashingTF().setInputCol("words").setOutputCol("features")
      .setBinary(true).setNumFeatures(1 << 14)
    val vecs = tf.transform(docs).filter(col("doc_id").isNotNull)

    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(12).setSeed(42L)
    val model = lsh.fit(vecs)
    val lshPairs = model.approxSimilarityJoin(vecs, vecs, 0.2, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact strong pairs (Jaccard >= 0.8) on the same subset
    val d2 = docs.select(col("doc_id").as("b"), col("words").as("w2"))
    val exact = docs.join(d2, col("doc_id") < col("b"))
      .withColumn("j", size(array_intersect(col("words"), col("w2"))).cast("double") /
        size(array_union(col("words"), col("w2"))))
      .filter(col("j") >= 0.8)
      .select(col("doc_id"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "test needs at least one strong pair")
    val missed = exact -- lshPairs
    // 12 hash tables at J>=0.8: miss probability per pair < (1-0.8)^12 ~ 4e-9
    assert(missed.isEmpty, s"LSH missed strong pairs: $missed")
  }
}
