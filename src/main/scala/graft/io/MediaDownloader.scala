package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.io.{File, FileOutputStream, InputStream}
import java.net.{URI, URLConnection}
import java.nio.file.{Files, Paths}

/** Media-file downloader — the reference's HTTP download operator
  * (`extractFilenames` `/root/reference/etl/util.go:48-72`,
  * `downloadFiles/downloadFile` `etl/util.go:91-151`; URL =
  * `Download.HTTP.BaseURL + value`, `config/config.go:17-28`; saved under
  * `<out>/media/<url-path>`).
  *
  * Re-expressed Spark-first: project the one download column, drop
  * null/empty values (the reference's filter, `util.go:57-67`), distinct,
  * then `foreachPartition` does the I/O on executors. The reference
  * nominally downloads in chunks of 10 but a misplaced `g.Wait()`
  * serializes it (`util.go:110`); here `parallelism` partitions genuinely
  * run concurrently, and at 100 TB the same code fans out across the
  * cluster with no driver involvement.
  *
  * `file://` base URLs are supported so tests (and air-gapped runs) can
  * exercise the full path without a network.
  */
object MediaDownloader {

  final case class Result(attempted: Long, failed: Long)

  /** Download every distinct non-empty value of `column`, interpreted as
    * `baseUrl + value`, into `outDir/media/<path-of-url>`.
    */
  def download(df: DataFrame, column: String, baseUrl: String,
      outDir: String, parallelism: Int = 10): Result = {
    val urls = df.select(col(column).cast("string").as("p"))
      .where(col("p").isNotNull && length(col("p")) > 0)
      .distinct()
      .select(concat(lit(baseUrl), col("p")).as("url"))
      .repartition(parallelism)

    val spark = df.sparkSession
    val attempted = spark.sparkContext.longAccumulator("media_attempted")
    val failed = spark.sparkContext.longAccumulator("media_failed")
    val mediaRoot = s"$outDir/media"

    urls.foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
      it.foreach { row =>
        val url = row.getString(0)
        attempted.add(1)
        try fetchOne(url, mediaRoot)
        catch { case _: Exception => failed.add(1) }
      }
    }
    Result(attempted.value, failed.value)
  }

  /** Fetch one URL to `<mediaRoot>/<url-path>` (mirrors the reference's
    * path layout, `etl/util.go:119-141`).
    */
  private[io] def fetchOne(url: String, mediaRoot: String): Unit = {
    val uri = new URI(url)
    val rel = Option(uri.getPath).getOrElse("").stripPrefix("/")
    if (rel.isEmpty) throw new IllegalArgumentException(s"no path in $url")
    // a column value like `../../x` must not escape the media root
    val root = Paths.get(mediaRoot).toAbsolutePath.normalize
    val target = root.resolve(rel).normalize
    if (!target.startsWith(root))
      throw new IllegalArgumentException(s"path escapes media root: $url")
    Files.createDirectories(target.getParent)
    val in: InputStream = uri.getScheme match {
      case "file" => Files.newInputStream(Paths.get(uri.getPath))
      case _ =>
        val conn: URLConnection = uri.toURL.openConnection()
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(30000)
        conn.getInputStream
    }
    try {
      val out = new FileOutputStream(new File(target.toString))
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
    } finally in.close()
  }
}
