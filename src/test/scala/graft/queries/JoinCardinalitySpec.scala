package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** `join_cardinality`'s whole point is predicting a join's size WITHOUT
  * running it — so the spec runs the join and pins the prediction to
  * the materialized truth, plus the fanout diagnostics against direct
  * computation.
  */
class JoinCardinalitySpec extends SparkSpec {

  test("predicted join size == materialized join count; diagnostics exact") {
    val dir = "/root/testdata/sf0.001"
    val orders = graft.Tables(spark, dir, "orders")
    val lineitem = graft.Tables(spark, dir, "lineitem")
    val r = OlapQueries.joinCardinality(spark, dir).collect().head

    val actual = orders.join(lineitem,
      col("o_orderkey") === col("l_orderkey")).count()
    assert(r.getAs[Long]("join_rows") == actual && actual > 0)

    val maxKey = lineitem.groupBy("l_orderkey").count()
      .join(orders.groupBy("o_orderkey").count()
        .withColumnRenamed("count", "co"),
        col("o_orderkey") === col("l_orderkey"))
      .select(max(col("count") * col("co"))).head().getLong(0)
    assert(r.getAs[Long]("max_key_rows") == maxKey)
    assert(r.getAs[Long]("keys_orders") ==
      orders.select("o_orderkey").distinct().count())
    assert(r.getAs[Long]("keys_lineitem") ==
      lineitem.select("l_orderkey").distinct().count())
  }
}
