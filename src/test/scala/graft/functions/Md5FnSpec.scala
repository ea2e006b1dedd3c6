package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the native [[Md5Prefix60]] against the spelled-out SQL idiom it
  * replaces — as a column AND inside a higher-order-function lambda
  * (the hot call position), where only registry functions resolve.
  */
class Md5FnSpec extends SparkSpec {

  test("md5h60 == conv(substring(md5(x),1,15),16,10) on random strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cases = Seq("", "a", " ", "hello world", "é日本語", "x" * 500) ++
      (1 to 60).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString)
    val rows = cases.toDF("s")
      .withColumn("native", Md5Prefix60.md5h60(col("s")))
      .withColumn("idiom",
        expr("cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint)"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), r.getString(0)))
    // non-negative by construction (60 bits)
    rows.foreach(r => assert(r.getLong(1) >= 0))
  }

  test("md5h60 resolves inside a HOF lambda after register()") {
    import spark.implicits._
    Md5Prefix60.register(spark)
    val got = Seq(Seq("alpha", "beta", "gamma")).toDF("ws")
      .select(expr("transform(ws, w -> md5h60(w))").as("n"),
        expr("transform(ws, w -> cast(conv(substring(md5(w), 1, 15), 16, 10) AS bigint))").as("i"))
      .head()
    assert(got.getSeq[Long](0) == got.getSeq[Long](1))
  }

  test("null in, null out") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("s")
      .select(Md5Prefix60.md5h60(col("s"))).head()
    assert(r.isNullAt(0))
  }
}
