package graft.ext

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The production IVF path (SCALE.md): spark.ml KMeans centroids instead
  * of the oracle query's deterministic first-16 stand-ins. Not
  * DuckDB-checkable (KMeans is Spark-internal), so the gate is a RECALL
  * bound: IVF top-k probing 3 of 8 learned cells must recover most of
  * the brute-force top-k. Seeded, so the number is stable.
  */
class MlKmeansIvfSpec extends SparkSpec {

  test("KMeans-cell IVF keeps recall@10 vs brute force") {
    val dir = "/root/testdata/sf0.001"
    val base = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("features", array_to_vector(col("v")))
      .cache()

    val model = new KMeans().setK(8).setSeed(42L)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(base)
    val assigned = model.transform(base).select("vec_id", "v", "cell")

    val queries = assigned.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("cell").as("qcell"))

    def topk(joined: org.apache.spark.sql.DataFrame, k: Int) = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(desc("cos"), asc("vec_id"))
      joined.filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", SimilarityQueries.cosineExpr("qv", "v"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select("query_id", "vec_id")
    }

    // brute force: every query against every vector
    val brute = topk(queries.crossJoin(assigned.select("vec_id", "v")), 10)

    // IVF: only vectors in the 3 cells nearest each query centroid
    val cents = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    val centDf = spark.createDataFrame(cents.toSeq).toDF("cell", "cv")
    val wProbe = Window.partitionBy(col("query_id")).orderBy(desc("ccos"), asc("cell"))
    val probes = queries.crossJoin(broadcast(centDf))
      .withColumn("ccos", SimilarityQueries.cosineExpr("qv", "cv"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= 3)
      .select("query_id", "qv", "cell")
    val ivf = topk(probes.join(assigned, Seq("cell")), 10)

    val hits = brute.intersect(ivf).count().toDouble
    val recall = hits / brute.count()
    info(f"recall@10 = $recall%.3f")
    assert(recall >= 0.6, s"IVF recall collapsed: $recall")
  }
}
