package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins that the two centroid cell-assignment paths — the driver-side
  * LITERAL fold (small nlist, constant-folded into codegen) and the
  * broadcast-variable [[graft.functions.CentroidTopK]] expression
  * (production nlist, matrix off-plan on an executor broadcast) — produce
  * IDENTICAL results on the same corpus, so the crossover at
  * `SimilarityQueries.CentroidLiteralMaxDoubles` is a pure plan-size
  * decision with no semantic edge. `maxLiteralDoubles = 0` forces the
  * broadcast path on the small fixture.
  */
class CentroidPathSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def base = SimilarityQueries.vecs(spark, dir)

  private def cents: Seq[(Long, Seq[Double])] =
    base.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("v")).collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))

  test("literal fold and broadcast expression assign identical cells and scores") {
    val cs = cents
    def assign(maxLit: Long) = base
      .withColumn("bc",
        SimilarityQueries.assignCellStruct(spark, cs, col("v"), maxLit))
      .select(col("vec_id"), col("bc.cell"), col("bc.best"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val lit = assign(Long.MaxValue)
    val bcast = assign(0L)
    assert(lit.nonEmpty)
    assert(lit === bcast)
  }

  test("literal sort and broadcast expression produce identical probe lists") {
    val cs = cents
    def probeLists(maxLit: Long) = base.filter(col("vec_id") < 5)
      .select(col("vec_id"),
        SimilarityQueries.topProbeCells(spark, cs, col("v"), 3, maxLit).as("cells"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq))
      .sortBy(_._1).toSeq
    val lit = probeLists(Long.MaxValue)
    val bcast = probeLists(0L)
    assert(lit.nonEmpty)
    assert(lit === bcast)
  }

  test("nprobe > nlist yields all cells, both paths") {
    val cs = cents.take(3)
    def lists(maxLit: Long) = base.filter(col("vec_id") < 2)
      .select(col("vec_id"),
        SimilarityQueries.topProbeCells(spark, cs, col("v"), 8, maxLit).as("cells"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).sortBy(_._1).toSeq
    val lit = lists(Long.MaxValue)
    val bcast = lists(0L)
    assert(lit === bcast)
    assert(lit.forall(_._2.size == 3))
  }

  test("zero-norm vectors land in the first cell on both paths (null-cosine → −2.0 contract)") {
    import spark.implicits._
    val cs = cents.take(4)
    val zero = Seq((9001L, Seq.fill(64)(0.0)), (9002L, Seq.tabulate(64)(_.toDouble)))
      .toDF("vec_id", "v")
    def assign(maxLit: Long) = zero
      .withColumn("bc", SimilarityQueries.assignCellStruct(spark, cs, col("v"), maxLit))
      .select(col("vec_id"), col("bc.cell"), col("bc.best"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val lit = assign(Long.MaxValue)
    val bcast = assign(0L)
    assert(lit === bcast)
    // zero-norm: every centroid scores −2.0, first-wins → lowest cent_id
    val zeroRow = lit.find(_._1 == 9001L).get
    assert(zeroRow._2 == cs.map(_._1).min && zeroRow._3 == -2.0)
  }

  test("NaN vectors score the degenerate −2.0 on both paths (no crash, identical assignment)") {
    import spark.implicits._
    val cs = cents.take(4)
    // a NaN element makes every cosine NaN; both paths must treat it as
    // the −2.0 no-match (nanvl in the fold, the guard in CentroidTopK.score)
    // rather than crash (BigDecimal.valueOf(NaN)) or diverge (NaN's
    // always-false comparisons)
    val rows = Seq(
      (9101L, Seq.fill(64)(Double.NaN)),
      (9102L, Double.NaN +: Seq.tabulate(63)(i => (i + 1).toDouble)),
      (9103L, Seq.tabulate(64)(_.toDouble))).toDF("vec_id", "v")
    def assign(maxLit: Long) = rows
      .withColumn("bc", SimilarityQueries.assignCellStruct(spark, cs, col("v"), maxLit))
      .select(col("vec_id"), col("bc.cell"), col("bc.best"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val lit = assign(Long.MaxValue)
    val bcast = assign(0L)
    assert(lit === bcast)
    val nanRow = lit.find(_._1 == 9101L).get
    assert(nanRow._2 == cs.map(_._1).min && nanRow._3 == -2.0)
    // probe lists agree too
    def probes(maxLit: Long) = rows
      .select(col("vec_id"),
        SimilarityQueries.topProbeCells(spark, cs, col("v"), 3, maxLit).as("cells"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).sortBy(_._1).toSeq
    assert(probes(Long.MaxValue) === probes(0L))
  }

  test("AnnIndex built on the broadcast path equals the literal-path index") {
    val cs = cents
    val tmpA = java.nio.file.Files.createTempDirectory("annlit").toString
    val tmpB = java.nio.file.Files.createTempDirectory("annbc").toString
    try {
      // force each path via a scoped override of the crossover input:
      // literal path uses the public default; broadcast path gets a
      // centroid set whose payload exceeds 0 (forced via assignCellStruct
      // inside build — exercised by building through a shim DataFrame)
      AnnIndex.build(base, cs, tmpA)
      // build the second index with the broadcast expression by calling
      // the assignment directly (AnnIndex.build always uses the default
      // crossover, which picks the literal at this size)
      base.withColumn("cell",
          SimilarityQueries.assignCellStruct(spark, cs, col("v"), 0L)
            .getField("cell"))
        .write.partitionBy("cell").mode("overwrite").parquet(s"$tmpB/ann_index")
      // read through the committed segment-log state (the root also
      // holds the manifest, so a direct root read no longer parses)
      val a = AnnIndex.rows(spark, tmpA)
        .select(col("vec_id"), col("cell").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val b = spark.read.parquet(s"$tmpB/ann_index")
        .select(col("vec_id"), col("cell").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(a === b)
    } finally {
      def rm(p: String): Unit = {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(p)).deleteRecursively()
      }
      rm(tmpA); rm(tmpB)
    }
  }
}
