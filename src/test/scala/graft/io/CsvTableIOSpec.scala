package graft.io

import graft.SparkSpec

/** CSV round-trip: types survive via the schema sidecar, and the three
  * classic corruption cases — embedded delimiter, embedded quote,
  * embedded NEWLINE — come back byte-identical. Also pins that a real
  * table (orders at sf0.001) survives a full write→read cycle with
  * every value equal under the original schema.
  */
class CsvTableIOSpec extends SparkSpec {

  test("hostile strings and types round-trip exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("csvio").toString
    val df = Seq(
      (1L, Some(3.5), "plain", Some(java.sql.Date.valueOf("2020-02-29"))),
      (2L, None, "comma, inside", None),
      (3L, Some(-0.25), "quote \" inside", Some(java.sql.Date.valueOf("1999-12-31"))),
      (4L, Some(0.0), "line\nbreak", None),
      (5L, Some(1e-6), "", None), // empty string, not null
      (6L, Some(2.0), "unicode é–☃", None))
      .toDF("id", "v", "s", "d")
    CsvTableIO.write(df, tmp, "t")
    val back = CsvTableIO.read(spark, tmp, "t")
    assert(back.schema == CsvTableIO.nullableForm(df.schema)) // sidecar wins over inference
    val a = df.orderBy("id").collect().toSeq
    val b = back.orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("a real table round-trips under its own schema, compressed") {
    val orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
    val tmp = java.nio.file.Files.createTempDirectory("csvio2").toString
    CsvTableIO.write(orders, tmp, "orders", compression = Some("gzip"))
    val back = CsvTableIO.read(spark, tmp, "orders")
    assert(back.schema == CsvTableIO.nullableForm(orders.schema))
    assert(back.count() == orders.count())
    val key = orders.columns.head
    assert(back.orderBy(key).collect().toSeq ==
      orders.orderBy(key).collect().toSeq)
  }
}
