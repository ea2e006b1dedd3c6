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
    scored.withColumn("rank", row_number().over(w).cast("long"))
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
      .withColumn("rank", row_number().over(wRank).cast("long"))
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
    * quantization is invertible to within rounding. The verified output
    * carries the quantized vector as a scalar md5 fingerprint (`q_fp`) plus
    * its L1 mass — pandas can't sort/hash a raw array column, and the
    * fingerprint pins every element byte-for-byte anyway.
    */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
      .withColumn("scale",
        expr("greatest(array_max(transform(v, x -> abs(x))), cast(1e-12 AS double))"))
      .select(col("vec_id"), round(col("scale"), 6).as("scale"),
        expr("transform(v, x -> cast(round(x / scale * 127.0, 0) AS int))").as("q"))
      .select(col("vec_id"), col("scale"),
        expr("md5(array_join(transform(q, x -> cast(x AS string)), ','))").as("q_fp"),
        expr("aggregate(q, 0L, (acc, x) -> acc + abs(x))").as("q_l1"))
      .orderBy("vec_id")
  }

  val embedQuantizeSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |  GREATEST(list_max(list_transform(v, x -> ABS(x))), 1e-12) AS scale
      |  FROM e),
      |q AS (SELECT vec_id, ROUND(scale, 6) AS scale,
      |  list_transform(v, x -> CAST(ROUND(x / scale * 127.0, 0) AS INT)) AS q
      |  FROM s)
      |SELECT vec_id, scale,
      |  md5(array_to_string(list_transform(q, x -> CAST(x AS VARCHAR)), ',')) AS q_fp,
      |  CAST(COALESCE(list_sum(list_transform(q, x -> ABS(x))), 0) AS BIGINT) AS q_l1
      |FROM q
      |ORDER BY vec_id""".stripMargin

  /** Sign-random-projection LSH near-dup pairs — the second ANN scale
    * path next to IVF: 16 deterministic Rademacher hyperplanes give every
    * vector a 16-bit sign signature; candidates share one of 4 bands of
    * 4 bits; exact cosine ≥ 0.35 verifies. Star-edge pairing per bucket
    * (the [[DedupQueries.jaccardPairs]] guard) keeps dense buckets linear.
    *
    * Candidate recall is the SRP collision curve: per-bit agreement
    * 1 − θ/π, so at this corpus's demo threshold (0.35 ≈ 69°, agreement
    * 0.62) a 4-bit band collides ~14% and any of 4 bands ~46%; at a TRUE
    * near-dup threshold (cos ≥ 0.9 ≈ 26°, agreement 0.86) the same
    * geometry gives ~55%/band and ~96% overall — production SRP dedup
    * runs tight thresholds with wider bands. As in [[DedupQueries]], the
    * emitted pairs are UNION-FIND EDGES (each member ↔ its bucket
    * representative), not an exhaustive enumeration — exhaustive
    * in-bucket pairing would need the minhash collect_list+cap form, and
    * 4-bit keys grow buckets ~n/16 with the corpus (production widens
    * keys as it widens thresholds).
    *
    * The plane matrix is a PURE FUNCTION of (plane, dim) via md5, so the
    * oracle rebuilds the identical ±1 entries in SQL; the Spark side bakes
    * them in as literals (computed once at plan build, zero per-row
    * hashing). Dot products fold left-to-right in both engines (Spark
    * `aggregate`, DuckDB `list_sum(list_transform(...))`) — the same
    * float-determinism contract as the cosine path.
    */
  private val nPlanes = 16
  private val dims = 64
  private[ext] def lshSign(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"lsh:$p:$d".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    if (hex.charAt(0) <= '7') 1.0 else -1.0
  }
  private def planesLit: String =
    (0 until nPlanes).map { p =>
      (0 until dims).map(d => s"${lshSign(p, d)}D").mkString("array(", ", ", ")")
    }.mkString("array(", ", ", ")")

  def embedLshPairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persist: (vec_id, v, sig) feeds banding and both verify joins once
    val e = vecs(spark, dir)
      .repartition(col("vec_id"))
      .withColumn("sig", expr(
        s"""aggregate(sequence(0, ${nPlanes - 1}), 0L, (acc, p) -> acc + shiftleft(
             CASE WHEN aggregate(zip_with(v, $planesLit[p], (x, r) -> x * r),
               0D, (a, x) -> a + x) > 0
             THEN 1L ELSE 0L END, p))"""))
      .select("vec_id", "v", "sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    val banded = e.select(col("vec_id"),
      explode(expr("transform(sequence(0, 3), " +
        "b -> struct(b AS band, shiftright(sig, b * 4) & 15 AS key))")).as("bb"))
      .select(col("vec_id"), col("bb.band"), col("bb.key"))
    val cand = banded
      .withColumn("vec_a", min(col("vec_id"))
        .over(Window.partitionBy(col("band"), col("key"))))
      .select(col("vec_a"), col("vec_id").as("vec_b"))
      .filter(col("vec_a") < col("vec_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("v_a")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("v_b")), Seq("vec_b"))
      .withColumn("cos0", cosineExpr("v_a", "v_b"))
      .select(col("vec_a"), col("vec_b"),
        explode(expr("filter(array(round(cos0, 6)), c -> c >= 0.35)")).as("cos"))
      .orderBy("vec_a", "vec_b")
  }

  val embedLshPairsSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sg AS (
      |  SELECT vec_id, v,
      |    CAST(list_sum(list_transform(range(0, $nPlanes), p ->
      |      CASE WHEN list_sum(list_transform(range(1, ${dims + 1}), d ->
      |          v[d] * (CASE WHEN substr(md5('lsh:' || CAST(p AS VARCHAR) || ':'
      |            || CAST(d - 1 AS VARCHAR)), 1, 1) <= '7'
      |            THEN 1.0 ELSE -1.0 END))) > 0
      |      THEN (CAST(1 AS BIGINT) << p) ELSE 0 END)) AS BIGINT) AS sig
      |  FROM e),
      |banded AS (
      |  SELECT vec_id, b.band, (sig >> (b.band * 4)) & 15 AS key
      |  FROM sg CROSS JOIN (SELECT unnest(range(0, 4)) AS band) b),
      |star AS (
      |  SELECT MIN(vec_id) OVER (PARTITION BY band, key) AS vec_a,
      |    vec_id AS vec_b
      |  FROM banded),
      |cand AS (SELECT DISTINCT vec_a, vec_b FROM star WHERE vec_a < vec_b)
      |SELECT c.vec_a, c.vec_b,
      |  ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
      |FROM cand c
      |JOIN e a ON a.vec_id = c.vec_a
      |JOIN e b ON b.vec_id = c.vec_b
      |WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.35
      |ORDER BY vec_a, vec_b""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "knn_brute" -> ((knnBrute _, knnBruteSql)),
    "ann_ivf" -> ((annIvf _, annIvfSql)),
    "embed_quantize" -> ((embedQuantize _, embedQuantizeSql)),
    "embed_lsh_pairs" -> ((embedLshPairs _, embedLshPairsSql))
  )
}
