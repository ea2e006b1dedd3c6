package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV interchange source/sink — the lowest-common-denominator format
  * every downstream BI/spreadsheet consumer of an extract still asks
  * for, next to [[JsonTableIO]]'s manifest-committed JSON artifacts.
  *
  * CSV is lossy about TYPES (everything is a string on disk), so the
  * writer persists the exact Spark schema as a `_schema.json` sidecar
  * (Catalyst's own JSON serialization) and the reader applies it
  * instead of re-inferring — an inferred read can silently turn a
  * zero-padded key column into integers or a date-ish string into a
  * timestamp, which then fails joins downstream. Quoting/escaping of
  * embedded delimiters, quotes and NEWLINES is delegated to Spark's
  * Univocity writer with `multiLine` reads (round-trip pinned by
  * CsvTableIOSpec, including the newline-in-field case naive
  * line-splitting readers corrupt).
  *
  * Scale posture: a plain partitioned `spark.write.csv` — one file per
  * partition, no driver collect, optional codec. CSV is an EXPORT
  * format here: the engine's own artifacts stay JSON/parquet (typed,
  * manifest-committed); this sink deliberately has no
  * generation/manifest machinery to misuse as a store.
  */
object CsvTableIO {

  /** CSV cannot witness non-nullability — every column comes back
    * nullable. (StructType.asNullable is private[sql].)
    */
  def nullableForm(s: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(
      s.fields.map(_.copy(nullable = true)))

  def write(df: DataFrame, outDir: String, tableName: String,
      compression: Option[String] = None): Unit = {
    val path = s"$outDir/$tableName"
    val w = df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"") // RFC-4180 doubled quotes, not backslash
      // NULL and '' are different values; CSV needs an explicit
      // sentinel to keep them apart (the Postgres COPY convention)
      .option("nullValue", "\\N")
      .option("emptyValue", "\"\"")
    compression.foreach(c => w.option("compression", c))
    w.csv(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$path/_schema.json"), true)
    // persist the nullable form so write→read is a fixed point (spec
    // pins equality modulo nullability)
    try out.write(nullableForm(df.schema).json.getBytes("UTF-8"))
    finally out.close()
  }

  def read(spark: SparkSession, outDir: String, tableName: String): DataFrame = {
    val path = s"$outDir/$tableName"
    val p = new org.apache.hadoop.fs.Path(s"$path/_schema.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val schemaJson =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true") // fields may contain newlines
      .option("nullValue", "\\N")
      .option("emptyValue", "")
      .csv(path)
  }
}
