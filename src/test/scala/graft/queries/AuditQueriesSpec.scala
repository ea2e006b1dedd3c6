package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.meta.FkEdge

/** The testdata has intact referential integrity, so the registered
  * `fk_orphans` oracle only proves the all-zero case. This spec PLANTS
  * orphans — a doctored copy of orders/customer with a third of the
  * parents deleted — and pins the exact orphan key/row counts.
  */
class AuditQueriesSpec extends SparkSpec {

  test("planted orphans are counted exactly, by key and by row") {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("fkaudit").toString
    try {
      val orders = graft.Tables(spark, src, "orders")
      val customer = graft.Tables(spark, src, "customer")
      // delete every third customer: their orders become orphans
      customer.filter(col("c_custkey") % 3 =!= 0)
        .write.parquet(s"$dir/customer.parquet")
      orders.write.parquet(s"$dir/orders.parquet")

      val expectedOrphanRows = orders.filter(col("o_custkey") % 3 === 0)
        .join(customer.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_semi")
        .count()
      val expectedOrphanKeys = orders.filter(col("o_custkey") % 3 === 0)
        .join(customer.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_semi")
        .select("o_custkey").distinct().count()

      val r = AuditQueries.edgeAudit(spark, dir,
          FkEdge("orders_custkey_fkey", "orders", "o_custkey", "customer", "c_custkey"))
        .collect()(0)
      assert(r.getAs[Long]("child_rows") == orders.count())
      assert(r.getAs[Long]("orphan_keys") == expectedOrphanKeys)
      assert(r.getAs[Long]("orphan_rows") == expectedOrphanRows)
      assert(!r.getAs[Boolean]("intact"))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("intact edge reports zero orphans and intact=true") {
    val r = AuditQueries.edgeAudit(spark, "/root/testdata/sf0.001",
        FkEdge("nation_regionkey_fkey", "nation", "n_regionkey", "region", "r_regionkey"))
      .collect()(0)
    assert(r.getAs[Long]("orphan_rows") == 0L && r.getAs[Boolean]("intact"))
  }
}
