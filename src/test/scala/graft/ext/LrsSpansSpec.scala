package graft.ext

import graft.SparkSpec

/** Pins `lrs_spans`' maximal-repeated-span geometry on crafted
  * documents: a repeated run of M tokens (M ≥ 5) has M − 4 duplicated
  * 5-gram windows that must stitch into ONE span of reported length
  * exactly M; non-adjacent repeats must stay separate spans; documents
  * with no corpus-repeated window must be absent.
  */
class LrsSpansSpec extends SparkSpec {

  test("repeated runs stitch into maximal spans of exact token length") {
    import spark.implicits._
    // an 8-token phrase shared by docs 1 and 2 (embedded at different
    // offsets, surrounded by unique filler) → one span of length 8 in
    // each; doc 3 carries TWO disjoint copies of a 5-token phrase also
    // present in doc 4 → two spans of length 5; doc 5 is all-unique
    val run8 = "k1 k2 k3 k4 k5 k6 k7 k8"
    val run5 = "p1 p2 p3 p4 p5"
    val docs = Seq(
      1L -> s"a1 a2 a3 $run8 a4 a5 a6 a7",
      2L -> s"b1 b2 b3 b4 b5 $run8 b6",
      3L -> s"c1 c2 $run5 c3 c4 c5 c6 c7 $run5 c8 c9",
      4L -> s"d1 $run5 d2 d3 d4 d5",
      5L -> "e1 e2 e3 e4 e5 e6 e7 e8 e9 e10"
    ).toDF("doc_id", "text")
    val got = DedupQueries.lrsSpansOn(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // (n_spans, max_span, dup_tokens)
    assert(got(1L) == ((1L, 8L, 8L)), s"doc1: ${got.get(1L)}")
    assert(got(2L) == ((1L, 8L, 8L)), s"doc2: ${got.get(2L)}")
    assert(got(3L) == ((2L, 5L, 10L)), s"doc3: ${got.get(3L)}")
    assert(got(4L) == ((1L, 5L, 5L)), s"doc4: ${got.get(4L)}")
    assert(!got.contains(5L), s"unique doc must be absent: ${got.get(5L)}")
  }

  test("a within-doc self-repeat counts (suffix-array semantics)") {
    import spark.implicits._
    // the repeat lives entirely inside ONE doc — position counts, not
    // per-doc distinct hashes, are what make this visible (dup_spans'
    // per-doc array_distinct would see each window once and miss it)
    val run = "s1 s2 s3 s4 s5 s6"
    val docs = Seq(
      10L -> s"x1 x2 $run y1 y2 y3 $run z1",
      11L -> "u1 u2 u3 u4 u5 u6 u7 u8"
    ).toDF("doc_id", "text")
    val got = DedupQueries.lrsSpansOn(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(10L) == ((2L, 6L, 12L)), s"doc10: ${got.get(10L)}")
    assert(!got.contains(11L))
  }

  test("lrs_dedup cuts every non-canonical copy and keeps the canonical one") {
    import spark.implicits._
    val run8 = "k1 k2 k3 k4 k5 k6 k7 k8"
    val run6 = "s1 s2 s3 s4 s5 s6"
    val docs = Seq(
      // cross-doc repeat: canonical = (doc 1, its start) → doc 2's copy cut
      1L -> s"a1 a2 $run8 a3",
      2L -> s"b1 $run8 b2",
      // self-repeat: first copy canonical, second cut
      10L -> s"x1 x2 $run6 y1 y2 y3 $run6 z1",
      // untouched doc: absent from the output
      20L -> "u1 u2 u3 u4 u5 u6 u7"
    ).toDF("doc_id", "text")
    val got = DedupQueries.lrsDedupOn(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    // doc 1 holds only the KEPT copy → no removed span → absent
    assert(!got.contains(1L), s"canonical doc must be untouched: ${got.get(1L)}")
    assert(got(2L) == ((10L, 8L, "b1 b2")), s"doc2: ${got.get(2L)}")
    assert(got(10L) == ((18L, 6L, s"x1 x2 $run6 y1 y2 y3 z1")),
      s"doc10: ${got.get(10L)}")
    assert(!got.contains(20L))
  }
}
