package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2 ext tier): treat media as an
  * opaque `binary` column with typed metadata, and run decode /
  * feature-extract as a partition-batched pipeline.
  *
  * The Spark-side plumbing is REAL and tested — schema
  * (`binary` + `struct` metadata), Dataset encoders, `mapPartitions`
  * batching, feature-vector schema — while the actual media decode is a
  * STUB: this container has no image/audio codecs, so `decodeStub`
  * computes a deterministic byte-histogram "embedding" standing in for a
  * model forward pass. Swap `decodeStub` for a real decoder (JNI codec or
  * a Python worker via mapInPandas on PySpark) without touching the
  * dataflow.
  *
  * Scale notes: media bytes never shuffle — the pipeline is scan →
  * narrow mapPartitions → write. Partition sizing comes from
  * `spark.sql.files.maxPartitionBytes`; at 100 TB the binary column
  * dominates row size, so keep media in its own table (media_id, data)
  * joined by id to metadata, exactly like this layout.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, data: Array[Byte],
      format: String, width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      features: Array[Double])

  /** Build a media table from `documents` (deterministic fake payloads:
    * UTF-8 bytes of the text; metadata from n_chars).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        col("text").cast("binary").as("data"),
        struct(lit("txt").as("format"),
          col("n_chars").cast("int").as("width"),
          lit(1).as("height")).as("meta"))
  }

  /** STUB decoder: 16-bucket byte histogram, normalized. Deterministic
    * stand-in for image decode + feature extraction. Batch shape: one
    * partition iterator in, one out — exactly where a real implementation
    * would batch rows into a model.
    */
  private[ext] def decodeStub(data: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < data.length) { hist((data(i) & 0xff) >> 4) += 1.0; i += 1 }
    if (data.length > 0) { var j = 0; while (j < 16) { hist(j) /= data.length; j += 1 } }
    hist
  }

  /** Feature extraction over the media table via partition-batched map. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("data"),
        col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // real impl: batch rows, hand the batch to a decoder/model here
        rows.map(r => MediaFeatures(r.doc_id, r.data.length, decodeStub(r.data)))
      }
  }

  /** STUB resize: deterministic byte subsampling to `targetW` columns —
    * stands in for an image resize kernel; the Spark-side contract
    * (binary in, binary out, metadata updated in the same projection) is
    * the real thing.
    */
  def resize(media: DataFrame, targetW: Int): DataFrame = {
    val w = col("meta.width")
    media.withColumn("data",
        expr(s"""CASE WHEN meta.width <= $targetW THEN data ELSE
                  cast(concat_ws('', transform(sequence(0, $targetW - 1),
                    i -> substring(cast(data AS string),
                           cast(i * meta.width / $targetW AS int) + 1, 1))) AS binary)
                END"""))
      .withColumn("meta", struct(col("meta.format").as("format"),
        least(w, lit(targetW)).as("width"), col("meta.height").as("height")))
  }

  /** STUB frame sampling: every `stride`-th record per source partition —
    * the video-frame-sample shape (keyed subsample, no shuffle).
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.filter(pmod(col("doc_id"), lit(stride)) === 0)

  /** Registered query: byte-level features with an oracle (histogram
    * buckets 2/6/7 are expressible as regex char-class counts in DuckDB —
    * ASCII space is 0x20, lowercase letters span 0x60–0x7a).
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, mediaTable(spark, dir))
      .select(col("doc_id"), col("n_bytes"),
        round(element_at(col("features"), 3), 6).as("h2"),
        round(element_at(col("features"), 7), 6).as("h6"),
        round(element_at(col("features"), 8), 6).as("h7"))
      .orderBy("doc_id")
  }

  val multimodalFeaturesSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  ROUND(CAST(len(regexp_extract_all(text, '[\x20-\x2f]')) AS DOUBLE)
      |    / octet_length(encode(text)), 6) AS h2,
      |  ROUND(CAST(len(regexp_extract_all(text, '[\x60-\x6f]')) AS DOUBLE)
      |    / octet_length(encode(text)), 6) AS h6,
      |  ROUND(CAST(len(regexp_extract_all(text, '[\x70-\x7f]')) AS DOUBLE)
      |    / octet_length(encode(text)), 6) AS h7
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Registered query: the resize stage end-to-end — every payload
    * subsampled to ≤32 columns, verified by an md5 fingerprint of the
    * resized BYTES (the corpus is pure ASCII, byte length == char length,
    * so DuckDB can rebuild the exact subsample from the text). The oracle
    * uses explicit floor(): Spark's double→int cast truncates while
    * DuckDB's rounds — the one semantic seam in the index arithmetic.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    resize(mediaTable(spark, dir), 32)
      .select(col("doc_id"),
        col("meta.width").cast("long").as("width"),
        md5(col("data")).as("data_fp"))
      .orderBy("doc_id")
  }

  val multimodalResizeSql: String =
    """SELECT doc_id,
      |  CAST(LEAST(n_chars, 32) AS BIGINT) AS width,
      |  md5(CASE WHEN n_chars <= 32 THEN text ELSE
      |    array_to_string(list_transform(range(0, 32),
      |      i -> substr(text, CAST(floor(i * n_chars / 32.0) AS INT) + 1, 1)), '')
      |  END) AS data_fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val all: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    "multimodal_features" -> ((multimodalFeatures _, multimodalFeaturesSql)),
    "multimodal_resize" -> ((multimodalResize _, multimodalResizeSql))
  )
}
