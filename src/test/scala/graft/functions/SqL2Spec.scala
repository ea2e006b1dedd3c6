package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the native [[SqL2]] against the HOF composite it fuses —
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0D, (acc,d) -> acc+d)`
  * — bitwise (same left-to-right double accumulation), including the
  * null/length-mismatch propagation the composite defines.
  */
class SqL2Spec extends SparkSpec {

  private val hof =
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
      "CAST(0.0 AS DOUBLE), (acc, d) -> acc + d)"

  test("sq_l2 == aggregate(zip_with(...)) bitwise on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val cases: Seq[(Seq[Double], Seq[Double])] =
      Seq((Seq.empty[Double], Seq.empty[Double]),
          (Seq(1.5), Seq(-2.5))) ++
      (1 to 60).map { _ =>
        val n = 1 + rnd.nextInt(64)
        ((0 until n).map(_ => rnd.nextDouble() * 100 - 50),
         (0 until n).map(_ => rnd.nextDouble() * 100 - 50))
      }
    val df = cases.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "a", "b")
      .withColumn("nat", SqL2.sq_l2(col("a"), col("b")))
      .withColumn("hofv", expr(hof))
    df.collect().foreach { r =>
      // bitwise: identical fold order must give the identical double
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(3)) ==
             java.lang.Double.doubleToRawLongBits(r.getDouble(4)),
        s"id=${r.getLong(0)}")
    }
  }

  test("null array, null element, and length mismatch all null out") {
    import spark.implicits._
    val df = Seq(
        (1L, Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](1.0))),
        (2L, None: Option[Seq[java.lang.Double]], Some(Seq[java.lang.Double](1.0))),
        (3L, Some(Seq[java.lang.Double](1.0, null)), Some(Seq[java.lang.Double](1.0, 2.0))),
        (4L, Some(Seq[java.lang.Double](1.0, 2.0)), Some(Seq[java.lang.Double](3.0, 4.0))))
      .toDF("id", "a", "b")
      .withColumn("nat", SqL2.sq_l2(col("a"), col("b")))
      .withColumn("hofv", expr(hof))
    df.collect().foreach { r =>
      assert(r.isNullAt(3) == r.isNullAt(4), s"id=${r.getLong(0)}")
      if (!r.isNullAt(3))
        assert(r.getDouble(3) == r.getDouble(4), s"id=${r.getLong(0)}")
    }
  }

  test("real corpus parity over the PQ subspace slices") {
    val base = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("v"))
    val sliced = base
      .withColumn("a", expr("slice(v, 1, 16)"))
      .withColumn("b", expr("slice(v, 17, 16)"))
      .withColumn("nat", SqL2.sq_l2(col("a"), col("b")))
      .withColumn("hofv", expr(hof))
    assert(sliced.filter(not(col("nat") === col("hofv"))).count() == 0L)
    assert(sliced.count() > 0L)
  }
}
