package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the distributed Lloyd loop against an in-memory reference
  * implementation (exact assignment equality — the quantized arithmetic
  * is designed to be bitwise-reproducible), the empty-cell carry-forward
  * rule, and determinism across runs.
  */
class KMeansSpec extends SparkSpec {

  /** Plain-Scala replica of the registered semantics: floor(x·10⁶)
    * quantization, left-fold squared-L2, (d, cell) lexicographic argmin,
    * exact integer sums, carry-forward on empty cells.
    */
  private def refLloyd(vecs: Seq[(Long, Seq[Float])], k: Int, iters: Int): Map[Long, Long] = {
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 1000000.0).toLong)) }
    var cents: Seq[(Long, Seq[Double])] =
      q.filter(_._1 < k).sortBy(_._1).map { case (id, qv) => (id, qv.map(_.toDouble)) }
    def assign(qv: Seq[Long]): Long = cents.map { case (cell, m) =>
      val d = qv.zip(m).foldLeft(0.0) { case (acc, (a, b)) => acc + (a - b) * (a - b) }
      (d, cell)
    }.min._2
    for (_ <- 1 until iters) {
      val byCell = q.groupBy(t => assign(t._2))
      cents = cents.map { case (cell, prev) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val n = rows.size
            (cell, rows.head._2.indices.map(i => rows.map(_._2(i)).sum.toDouble / n))
          case None => (cell, prev)
        }
      }
    }
    q.map(t => (t._1, assign(t._2))).toMap
  }

  private def collectAssign(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("distributed loop == reference loop on the sf0.001 corpus") {
    val raw = graft.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val vecs = raw.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val expected = refLloyd(vecs, KMeans.K, KMeans.Iters)
    val got = collectAssign(KMeans.kmeansTrain(spark, "/root/testdata/sf0.001"))
    assert(got == expected)
    // the training must actually separate the corpus, not collapse it
    assert(got.values.toSet.size > 1)
  }

  test("duplicate seeds leave a cell empty; carry-forward keeps its centroid") {
    import spark.implicits._
    // both init centroids are the same point, so every vector ties
    // toward cell 0 and cell 1 captures nothing in round 1
    val vecs = Seq(
      (0L, Seq(5.0e-6f)), (1L, Seq(5.2e-6f)), (2L, Seq(4.9e-6f)))
    val q = KMeans.quantized(vecs.toDF("vec_id", "embedding"))
    val init = Seq((0L, Seq(5.0)), (1L, Seq(5.0)))
    val updated = KMeans.updateCentroids(q, init)
    assert(updated.find(_._1 == 1L).get._2 == Seq(5.0)) // carried forward
    val qvals = q.select("qv").collect().map(_.getSeq[Long](0).head)
    assert(updated.find(_._1 == 0L).get._2 == Seq(qvals.sum.toDouble / qvals.length))
    // lloyd's own init is qv of vec_id < 2 ([4] and [5]): vec 2 (qv=4)
    // ties exactly onto cell 0 and the split is stable across rounds
    val assigned = collectAssign(KMeans.lloyd(q, 2, 3))
    assert(assigned == Map(0L -> 0L, 1L -> 1L, 2L -> 0L))
  }

  test("trained IVF emits a full ranked top-5 per query") {
    val rows = KMeans.annIvfTrained(spark, "/root/testdata/sf0.001").collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    }
  }

  test("two runs produce identical assignments (bitwise-deterministic round)") {
    val a = collectAssign(KMeans.kmeansTrain(spark, "/root/testdata/sf0.001"))
    val b = collectAssign(KMeans.kmeansTrain(spark, "/root/testdata/sf0.001"))
    assert(a == b)
  }

  test("silhouette_kmeans == independent computation on sf0.001") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val vecs = graft.Tables(spark, sf, "embeddings")
      .filter(col("embedding").isNotNull)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 1000000.0).toLong)) }
    var cents: Seq[(Long, Seq[Double])] = q.filter(_._1 < KMeans.K)
      .sortBy(_._1).map { case (id, qv) => (id, qv.map(_.toDouble)) }
    def dists(qv: Seq[Long]): Seq[(Double, Long)] =
      cents.map { case (cell, m) =>
        (qv.zip(m).foldLeft(0.0) { case (acc, (x, y)) =>
          acc + (x - y) * (x - y) }, cell) }
    for (_ <- 1 until KMeans.Iters) {
      val byCell = q.groupBy(t => dists(t._2).min._2)
      cents = cents.map { case (cell, prev) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val n = rows.size
            (cell, rows.head._2.indices
              .map(i => rows.map(_._2(i)).sum.toDouble / n))
          case None => (cell, prev)
        }
      }
    }
    val per = q.map { case (_, qv) =>
      val ds = dists(qv).sorted
      val aD = math.sqrt(ds(0)._1); val bD = math.sqrt(ds(1)._1)
      val s = if (math.max(aD, bD) > 0) (bD - aD) / math.max(aD, bD) else 0.0
      (ds(0)._2, math.floor(s * 1000000.0).toLong)
    }
    val want = per.groupBy(_._1).map { case (cell, xs) =>
      (cell, xs.size.toLong, (xs.map(_._2).sum / xs.size) / 1e6)
    }.toSeq.sortBy(_._1)
    val got = KMeans.silhouetteKmeans(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == want, s"silhouette mismatch: got $got want $want")
    assert(got.forall(r => r._3 >= -1.0 && r._3 <= 1.0))
  }
}
