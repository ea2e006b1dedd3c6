package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (SURVEY.md §2 ext tier).
  *
  *  - `knn_brute`: exact cosine top-k — the correctness baseline. The
  *    query set is tiny, so the join is a broadcast of the queries against
  *    a single scan of the corpus: at 100 TB this is the classic
  *    "broadcast the probes, scan the base" pattern (no shuffle of the
  *    base table at all).
  *  - `ann_ivf`: the scale path — IVF-style cell assignment (argmin over
  *    a fixed centroid set), probe the nearest `nprobe` cells only. Here
  *    centroids are a deterministic subset of vectors (vec_id < 16) so
  *    the DuckDB oracle can replay the exact assignment; production would
  *    train them with k-means (spark.ml) and keep the same assign/probe
  *    dataflow, plus a bucketed/partitioned-by-cell base table so a probe
  *    touches only its cells' files.
  *
  * Cosine is computed in double precision with a fixed fold order
  * (element order) in both engines, then rounded to 6 decimals — the
  * cross-engine float-determinism contract.
  */
object SimilarityQueries {

  /** Cosine similarity — native Catalyst expression with codegen
    * ([[graft.functions.CosineSimilarity]]): one fused loop, bitwise-equal
    * to the HOF formulation it replaced (CosineSimilaritySpec proves it).
    */
  def cosineExpr(a: String, b: String): Column =
    graft.functions.CosineSimilarity.cosine_sim(col(a), col(b))

  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))

  /** Exact brute-force cosine top-5 for query vectors (vec_id < 5). */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = vecs(spark, dir)
    val q = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = base.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosineExpr("qv", "v"), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
      .orderBy("query_id", "rank")
  }

  val knnBruteSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.query_id, e.vec_id,
      |    ROUND(list_cosine_similarity(q.qv, e.v), 6) AS cos
      |  FROM e CROSS JOIN q WHERE e.vec_id != q.query_id),
      |ranked AS (
      |  SELECT query_id, vec_id, cos,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, vec_id, cos FROM ranked
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** IVF-style ANN: assign every vector to its nearest of 16 fixed
    * centroids (vec_id < 16), then for each query (vec_id < 5) probe the
    * 2 nearest cells and rank top-5 within them.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = vecs(spark, dir)
    val cents = base.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("v").as("cv"))

    // cell assignment: argmax cosine over centroids (deterministic
    // tie-break on cent_id via the row_number ordering)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(desc("ccos"), asc("cent_id"))
    val assigned = base.join(broadcast(cents), lit(true))
      .withColumn("ccos", round(cosineExpr("cv", "v"), 6))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("label"), col("v"), col("cent_id").as("cell"))

    // probe list: 2 nearest cells per query vector
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(desc("qcos"), asc("cent_id"))
    val probes = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .join(broadcast(cents), lit(true))
      .withColumn("qcos", round(cosineExpr("cv", "qv"), 6))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= 2)
      .select(col("query_id"), col("qv"), col("cent_id").as("cell"))

    // search only within probed cells
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc("vec_id"))
    assigned.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosineExpr("qv", "v"), 6))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id"), col("cell"), col("cos"))
      .orderBy("query_id", "rank")
  }

  val annIvfSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |c AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 16),
      |assigned AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT e.vec_id, e.v, c.cent_id AS cell,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY ROUND(list_cosine_similarity(c.cv, e.v), 6) DESC, c.cent_id) AS arn
      |    FROM e CROSS JOIN c)
      |  WHERE arn = 1),
      |probes AS (
      |  SELECT query_id, qv, cell FROM (
      |    SELECT e.vec_id AS query_id, e.v AS qv, c.cent_id AS cell,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |        ORDER BY ROUND(list_cosine_similarity(c.cv, e.v), 6) DESC, c.cent_id) AS prn
      |    FROM e CROSS JOIN c WHERE e.vec_id < 5)
      |  WHERE prn <= 2),
      |ranked AS (
      |  SELECT p.query_id, a.vec_id, a.cell,
      |    ROUND(list_cosine_similarity(p.qv, a.v), 6) AS cos,
      |    ROW_NUMBER() OVER (PARTITION BY p.query_id
      |      ORDER BY ROUND(list_cosine_similarity(p.qv, a.v), 6) DESC, a.vec_id) AS rank
      |  FROM assigned a JOIN probes p ON a.cell = p.cell
      |  WHERE a.vec_id != p.query_id)
      |SELECT query_id, rank, vec_id, cell, cos FROM ranked
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Symmetric int8 quantization per vector (max-abs scale — the storage
    * form a 100 TB embedding corpus actually ships: 4× smaller than fp32,
    * dequantize = q * scale / 127). One narrow projection, no shuffle
    * except the presentation sort; the scale survives as a column so the
    * quantization is invertible to within rounding.
    */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("scale",
        expr("greatest(array_max(transform(v, x -> abs(x))), cast(1e-12 AS double))"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        expr("transform(v, x -> cast(round(x / scale * 127.0, 0) AS int))").as("q"))
      .orderBy("vec_id")
  }

  val embedQuantizeSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |  GREATEST(list_max(list_transform(v, x -> ABS(x))), 1e-12) AS scale
      |  FROM e)
      |SELECT vec_id, ROUND(scale, 6) AS scale,
      |  list_transform(v, x -> CAST(ROUND(x / scale * 127.0, 0) AS INT)) AS q
      |FROM s
      |ORDER BY vec_id""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "knn_brute" -> ((knnBrute _, knnBruteSql)),
    "ann_ivf" -> ((annIvf _, annIvfSql)),
    "embed_quantize" -> ((embedQuantize _, embedQuantizeSql))
  )
}
