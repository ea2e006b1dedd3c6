package graft

import org.apache.spark.sql.types._

/** Pins the Spark-read schema of every driver testdata table.
  *
  * Insurance against silent testdata regeneration: in round 6 the driver
  * rewrote `events.ts` from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS)
  * and nothing in this suite noticed — 21 queries and the bench failed
  * driver-side instead of here with a named column. If a type below
  * changes again, this spec fails first, naming the table and column.
  *
  * Expectations are the types Spark reads under this suite's session conf
  * (`nanosAsLong=true`, timeZone=UTC). Parquet `timestamp[us]` files
  * written without isAdjustedToUTC arrive as TIMESTAMP_NTZ; `Tables`
  * normalizes only `events.ts` (to a session-UTC instant) because the
  * events queries do instant arithmetic, while `o_orderdate`/`l_shipdate`
  * are used as wall-clock dates where NTZ semantics match DuckDB's naive
  * TIMESTAMP exactly.
  */
class SchemaGuardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def pin(table: String, expected: Seq[(String, DataType)]): Unit = {
    val actual = Tables(spark, dir, table).schema.map(f => (f.name, f.dataType))
    assert(actual == expected, s"\ntable `$table` schema drifted:\n  read   = $actual\n  pinned = $expected")
  }

  test("region schema pinned") {
    pin("region", Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
  }

  test("nation schema pinned") {
    pin("nation", Seq("n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
  }

  test("customer schema pinned") {
    pin("customer", Seq("c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
  }

  test("supplier schema pinned") {
    pin("supplier", Seq("s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
  }

  test("part schema pinned") {
    pin("part", Seq("p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("orders schema pinned") {
    pin("orders", Seq("o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType))
  }

  test("lineitem schema pinned") {
    pin("lineitem", Seq("l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType))
  }

  test("events schema pinned: ts normalized to session-UTC timestamp") {
    pin("events", Seq("event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("documents schema pinned") {
    pin("documents", Seq("doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
  }

  test("embeddings schema pinned") {
    pin("embeddings", Seq("vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("events ts instants agree with raw NTZ wall clock reinterpreted as UTC") {
    // the normalization must only re-tag the wall clock, never shift it:
    // min/max rendered in the UTC session must equal the raw NTZ min/max
    import org.apache.spark.sql.functions._
    val norm = Tables(spark, dir, "events")
      .agg(date_format(min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("lo"),
           date_format(max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("hi")).head
    val raw = spark.read.parquet(s"$dir/events.parquet")
      .agg(date_format(min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("lo"),
           date_format(max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("hi")).head
    assert(norm == raw, s"ts normalization shifted instants: normalized=$norm raw=$raw")
  }

  test("events ts instants are session-timezone invariant (non-UTC session)") {
    // the NTZ branch exists for foreign non-UTC sessions: cast(NTZ→TS)
    // yields wall−offset, from_utc_timestamp adds the offset back, so the
    // resulting INSTANT must be identical to the UTC-session read. A
    // to_utc_timestamp here would subtract the offset twice (wall−2·offset)
    // and this pin would catch it.
    import org.apache.spark.sql.functions._
    def instants(): org.apache.spark.sql.Row =
      Tables(spark, dir, "events")
        .agg(min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi")).head
    val utc = instants()
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = instants()
      assert(ny == utc, s"ts instants drift with session tz: NY=$ny UTC=$utc")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
