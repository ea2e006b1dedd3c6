package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.mediaTable(spark, "/root/testdata/sf0.001")

  test("media table schema: opaque binary + typed metadata") {
    val s = media.schema
    assert(s("data").dataType.typeName == "binary")
    assert(s("meta").dataType.typeName == "struct")
  }

  test("feature extraction is deterministic and normalized") {
    val f = Multimodal.extractFeatures(spark, media)
    val rows = f.orderBy("doc_id").limit(5).collect()
    rows.foreach { r =>
      assert(r.features.length == 16)
      assert(math.abs(r.features.sum - 1.0) < 1e-9) // histogram sums to 1
      assert(r.n_bytes > 0)
    }
    val again = Multimodal.extractFeatures(spark, media)
      .orderBy("doc_id").limit(5).collect()
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("resize stub caps width and shrinks payload; metadata tracks it") {
    val r = Multimodal.resize(media, 16)
    val rows = r.select(col("doc_id"), length(col("data")).as("n"),
        col("meta.width").as("w")).orderBy("doc_id").collect()
    rows.foreach { row =>
      assert(row.getAs[Int]("w") <= 16)
      assert(row.getAs[Int]("n") <= math.max(16, row.getAs[Int]("w")))
    }
  }

  test("frame sampling keeps every stride-th record, no shuffle") {
    val s = Multimodal.sampleFrames(media, 10)
    assert(s.count() == media.filter(pmod(col("doc_id"), lit(10)) === 0).count())
    assert(!s.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("to_json/from_json round-trip of metadata (F5 encode side)") {
    val enc = media.select(col("doc_id"), to_json(col("meta")).as("j"))
    val dec = enc.select(col("doc_id"),
      from_json(col("j"), media.schema("meta").dataType).as("meta2"))
    val joined = media.join(dec, "doc_id")
      .filter(col("meta.width") =!= col("meta2.width") ||
              col("meta.format") =!= col("meta2.format"))
    assert(joined.isEmpty)
  }
}
