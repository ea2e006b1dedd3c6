package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Structural invariants for the z-order layout stats and the PSI drift
  * monitor (exact values are pinned by the DuckDB oracle; these pin the
  * semantics the oracle can't see: bit-consistency of the bucket fences
  * and conservation of the corpus count).
  */
class LayoutDriftSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every z-bucket's fences bin back to the bucket's own bits") {
    val li = graft.Tables(spark, dir, "lineitem")
    val (maxp, maxs) = {
      val r = li.agg(max(col("l_partkey").cast("long")),
        max(col("l_suppkey").cast("long"))).head
      (r.getLong(0), r.getLong(1))
    }
    def bin(v: Long, mx: Long): Long = v * 16 / (mx + 1)
    val rows = Bucketing.zorderLayout(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == li.count())
    rows.foreach { r =>
      val z = r.getAs[Long]("zkey")
      assert(z >= 0 && z < 256)
      val bp = (0 until 4).map(i => ((z >> (2 * i + 1)) & 1) << i).sum
      val bs = (0 until 4).map(i => ((z >> (2 * i)) & 1) << i).sum
      // min and max of BOTH dims must land in the bucket's own bins —
      // the fence tightness that makes file skipping work on either dim
      assert(bin(r.getAs[Long]("min_part"), maxp) == bp)
      assert(bin(r.getAs[Long]("max_part"), maxp) == bp)
      assert(bin(r.getAs[Long]("min_supp"), maxs) == bs)
      assert(bin(r.getAs[Long]("max_supp"), maxs) == bs)
    }
  }

  test("range-partition split keys are monotone and in key range") {
    val li = graft.Tables(spark, dir, "lineitem")
    val maxk = li.agg(max(col("l_orderkey").cast("long"))).head.getLong(0)
    val rows = Bucketing.rangePartitionBounds(spark, dir)
      .orderBy("part_idx").collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    val keys = rows.map(_.getAs[Long]("split_key"))
    assert(keys.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    assert(keys.forall(k => k >= 0 && k <= maxk))
  }

  test("partition plan floors at one partition and bounds bytes below") {
    val rows = Bucketing.partitionPlan(spark, dir).collect()
    assert(rows.map(_.getAs[String]("table_name")).toSet ==
      Set("lineitem", "orders", "events", "documents"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_parts_128mb") >= 1L)
      assert(r.getAs[Long]("est_bytes") >= r.getAs[Long]("n_rows"))
    }
  }

  test("PSI bins conserve the corpus and terms are finite") {
    val ev = graft.Tables(spark, dir, "events").filter(col("value").isNotNull)
    val rows = CurationQueries.driftPsi(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")).sum == ev.count())
    rows.foreach { r =>
      val t = r.getAs[Double]("psi_term")
      assert(!t.isNaN && !t.isInfinite)
    }
  }
}
