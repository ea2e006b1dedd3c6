package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("cosine_sim is a SQL function on an extensions-built session") {
    // getOrCreate returns any live session, ignoring withExtensions —
    // stop it so this builder genuinely applies the extensions (tests
    // run sequentially in the forked JVM; later suites recreate lazily)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val v = spark.sql(
        "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
        .collect()(0).getDouble(0)
      assert(v == 1.0)
      val s = spark.sql("SELECT simhash60('a b c') AS s").collect()(0).getLong(0)
      assert(s >= 0L && s < (1L << 60))
    } finally spark.stop()
  }
}
