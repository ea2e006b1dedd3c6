package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.SimHash60.simhash60

class SimHash60Spec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")

  /** The HOF formulation the DuckDB oracle runs — bit-equality against it
    * on real data is the contract the native expression must keep.
    */
  private val hof = expr(
    """aggregate(
         zip_with(
           aggregate(
             transform(split(text, ' '),
               w -> cast(conv(substring(md5(w), 1, 15), 16, 10) AS bigint)),
             transform(sequence(0, 59), i -> 0L),
             (acc, h) -> zip_with(acc, sequence(0, 59),
               (a, i) -> a + shiftright(h, i) % 2 * 2 - 1)),
           sequence(0, 59),
           (v, i) -> shiftleft(CASE WHEN v > 0 THEN 1L ELSE 0L END, i)),
         0L, (acc, x) -> acc + x)""")

  test("native expression equals the HOF formulation on real documents") {
    val diff = docs
      .select(simhash60(col("text")).as("native"), hof.as("hofv"))
      .filter(col("native") =!= col("hofv"))
      .count()
    assert(diff == 0L)
  }

  test("edge tokens: empties kept, multiplicity counted, null in null out") {
    val df = Seq(
      Some("a a a b"), // multiplicity: 'a' outvotes 'b' on every differing bit
      Some("x  y"),    // double space -> empty middle token, like the SQL split
      Some(""),        // single empty token
      None             // null text
    ).toDF("text")
    val rows = df.select(simhash60(col("text")).as("s"), hof.as("h")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
    // signatures stay within 60 bits
    val inRange = df.filter(col("text").isNotNull)
      .select(simhash60(col("text")).as("s"))
      .filter(col("s") < 0 || col("s") >= expr("shiftleft(1L, 60)"))
    assert(inRange.count() == 0L)
  }

  test("property: native equals HOF on generated texts (unicode, repeats, empties)") {
    import org.scalacheck.{Gen, rng}
    val word = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("", "a", "naïve", "日本語", "x-y_z", "0042", "%+@"),
      Gen.listOfN(3, Gen.choose('!', '~')).map(_.mkString))
    val text = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val seed0 = rng.Seed(7L)
    val texts = Iterator.iterate((text.pureApply(Gen.Parameters.default, seed0), seed0.next)) {
      case (_, s) => (text.pureApply(Gen.Parameters.default, s), s.next)
    }.map(_._1).take(60).toSeq
    val diff = texts.toDF("text")
      .select(simhash60(col("text")).as("native"), hof.as("hofv"))
      .filter(col("native") =!= col("hofv"))
      .count()
    assert(diff == 0L)
  }

  test("SQL registration works") {
    SimHash60.register(spark)
    val n = spark.sql(
      "SELECT simhash60('the quick brown fox') AS s").collect()(0).getLong(0)
    val m = Seq("the quick brown fox").toDF("text")
      .select(simhash60(col("text"))).collect()(0).getLong(0)
    assert(n == m)
  }
}
