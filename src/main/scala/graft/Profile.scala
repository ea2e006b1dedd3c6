package graft

/** Local-iteration helper: run registered queries N times each and print
  * per-iteration wall time, separating cold-start (codegen, parquet
  * footers, broadcast warmup) from steady-state cost. Not used by the
  * driver — Bench is the recorded number.
  *
  * Usage: runMain graft.Profile <sfDir> <n> <query> [query...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- args.drop(2)) {
      val fn = SparkEntry.queries(q)
      val times = (1 to n).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$q%-28s " + times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
