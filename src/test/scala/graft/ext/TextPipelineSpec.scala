package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The stability claims the split/pack operators make: assignments are a
  * pure function of the data, not of the physical layout.
  */
class TextPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("train/test split is stable under repartitioning and ~80/10/10") {
    val a = TextQueries.trainTestSplit(spark, dir)
    val n = a.count()
    // recompute on a differently-partitioned session view: identical rows
    val b = TextQueries.trainTestSplit(spark, dir).repartition(7)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val frac = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / n).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("valid") > 0.04 && frac("valid") < 0.16)
    assert(frac("test") > 0.04 && frac("test") < 0.16)
  }

  test("pack_chunks offsets are contiguous within each shard") {
    val p = TextQueries.packChunks(spark, dir).persist()
    // within a shard, tok_offset of doc k+1 == tok_offset + n_tokens of k
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy("doc_id")
    val gaps = p.withColumn("next_off", lead(col("tok_offset"), 1).over(w))
      .filter(col("next_off").isNotNull &&
        col("next_off") =!= col("tok_offset") + col("n_tokens"))
    assert(gaps.count() == 0L)
    // chunk ids never collide across shards (shard-prefixed)
    val cross = p.groupBy("chunk_id").agg(countDistinct("shard").as("s"))
      .filter(col("s") > 1)
    assert(cross.count() == 0L)
    p.unpersist()
  }
}
