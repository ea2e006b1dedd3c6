package graft.io

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The segment-log commit protocol: staged-but-uncommitted work must be
  * invisible, commits must be all-or-nothing (multi-part updates flip
  * together), tampered pointers must fail loudly, and cleanup must only
  * ever touch unreferenced names.
  */
class SegmentLogSpec extends AnyFunSuite {

  private def tmp() = Files.createTempDirectory("seglog-").toString

  test("never-committed root reads as None; commit round-trips") {
    val d = tmp()
    assert(SegmentLog.read(d).isEmpty)
    val st = SegmentLog.State(3L, Seq("seg-1", "seg-3"),
      Map("clusters" -> "clusters-g3", "bloom" -> "bloom-g2"))
    SegmentLog.commit(d, st)
    assert(SegmentLog.read(d).contains(st))
    assert(SegmentLog.nextGen(SegmentLog.read(d)) == 4L)
    assert(SegmentLog.read(d).get.segmentPaths(d) == Seq(s"$d/seg-1", s"$d/seg-3"))
    assert(SegmentLog.read(d).get.extraPath(d, "bloom") == s"$d/bloom-g2")
  }

  test("a staged segment without a commit is invisible (crash before commit)") {
    val d = tmp()
    SegmentLog.commit(d, SegmentLog.State(1L, Seq("seg-1"), Map.empty))
    // writer crashes after staging seg-2 but before committing
    Files.createDirectories(Paths.get(s"$d/seg-2"))
    Files.writeString(Paths.get(s"$d/seg-2/part-0.parquet"), "partial")
    assert(SegmentLog.read(d).get.segments == Seq("seg-1"))
    // the next maintenance pass sweeps the orphan; the live segment stays
    SegmentLog.cleanup(d)
    assert(!Files.exists(Paths.get(s"$d/seg-2")))
    assert(Files.exists(Paths.get(s"$d/manifest.json")))
  }

  test("cleanup never touches referenced names, sweeps superseded ones") {
    val d = tmp()
    Files.createDirectories(Paths.get(s"$d/seg-1"))
    Files.createDirectories(Paths.get(s"$d/clusters-g1"))
    Files.createDirectories(Paths.get(s"$d/clusters-g2"))
    Files.writeString(Paths.get(s"$d/unrelated.txt"), "keep me")
    SegmentLog.commit(d, SegmentLog.State(2L, Seq("seg-1"),
      Map("clusters" -> "clusters-g2")))
    SegmentLog.cleanup(d)
    assert(Files.exists(Paths.get(s"$d/seg-1")))
    assert(Files.exists(Paths.get(s"$d/clusters-g2")))
    assert(!Files.exists(Paths.get(s"$d/clusters-g1"))) // superseded
    assert(Files.exists(Paths.get(s"$d/unrelated.txt"))) // out of shape, untouched
  }

  test("tampered pointers fail loudly instead of resolving paths") {
    val d = tmp()
    SegmentLog.commit(d, SegmentLog.State(1L, Seq("seg-1"), Map.empty))
    Files.writeString(Paths.get(s"$d/manifest.json"),
      """{"gen": 2, "segments": ["../../etc"], "extras": {}}""")
    assertThrows[IllegalArgumentException](SegmentLog.read(d))
    Files.writeString(Paths.get(s"$d/manifest.json"),
      """{"gen": 2, "segments": [], "extras": {"clusters": "/abs/path-g1"}}""")
    assertThrows[IllegalArgumentException](SegmentLog.read(d))
    // and commit refuses to WRITE an out-of-shape pointer in the first place
    assertThrows[IllegalArgumentException](
      SegmentLog.commit(d, SegmentLog.State(3L, Seq("evil/../seg-1"), Map.empty)))
  }

  test("multi-part update is one flip: old pairing never mixes with new") {
    val d = tmp()
    SegmentLog.commit(d, SegmentLog.State(1L, Seq("seg-1"),
      Map("clusters" -> "clusters-g1")))
    // an append stages BOTH parts then commits once
    SegmentLog.commit(d, SegmentLog.State(2L, Seq("seg-1", "seg-2"),
      Map("clusters" -> "clusters-g2")))
    val st = SegmentLog.read(d).get
    // the reader resolves a CONSISTENT pair — two segments with g2, never
    // two segments with g1
    assert(st.segments == Seq("seg-1", "seg-2") &&
      st.extras("clusters") == "clusters-g2")
  }
}
