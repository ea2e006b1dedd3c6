package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed chains for the removal-effect fold (the cross-engine
  * replay is the hard gate; these pin the MODEL semantics). */
class MarkovSpec extends AnyFunSuite {

  test("single-channel funnel: the only channel takes all the credit") {
    // START -> a (10), a -> CONV (6), a -> NULL (4)
    val out = EventQueries.markovRemoval(Seq(
      ("START", "a", 10L), ("a", "CONV", 6L), ("a", "NULL", 4L)))
    assert(out.map(_._1) == Seq("a"))
    val (_, base, re, share) = out.head
    assert(base == 600000L)       // 0.6 conversion
    assert(re == 600000L)         // removing a kills everything
    assert(share.contains(1000000L))
  }

  test("two independent paths: credit follows conversion contribution") {
    // START -> a (50) -> CONV(40)/NULL(10); START -> b (50) -> CONV(10)/NULL(40)
    val out = EventQueries.markovRemoval(Seq(
      ("START", "a", 50L), ("START", "b", 50L),
      ("a", "CONV", 40L), ("a", "NULL", 10L),
      ("b", "CONV", 10L), ("b", "NULL", 40L)))
    val byC = out.map(o => o._1 -> o).toMap
    // base = 0.5*0.8 + 0.5*0.2 = 0.5
    assert(byC("a")._2 == 500000L)
    // removing a: 0.5*0 + 0.5*0.2 = 0.1 -> re_a = 0.4; re_b = 0.1
    assert(byC("a")._3 == 400000L)
    assert(byC("b")._3 == 100000L)
    // shares 0.8 / 0.2
    assert(byC("a")._4.contains(800000L))
    assert(byC("b")._4.contains(200000L))
  }

  test("chained path: both required channels carry the full effect") {
    // START -> a -> b -> CONV: removing either kills all conversion
    val out = EventQueries.markovRemoval(Seq(
      ("START", "a", 10L), ("a", "b", 10L), ("b", "CONV", 10L)))
    val byC = out.map(o => o._1 -> o).toMap
    assert(byC("a")._2 == 1000000L)
    assert(byC("a")._3 == 1000000L && byC("b")._3 == 1000000L)
    assert(byC("a")._4.contains(500000L))
    assert(byC("b")._4.contains(500000L))
  }

  test("no conversions anywhere: removal effects exist but shares are None") {
    val out = EventQueries.markovRemoval(Seq(
      ("START", "a", 5L), ("a", "NULL", 5L)))
    assert(out.head._2 == 0L)
    assert(out.head._3 == 0L)
    assert(out.head._4.isEmpty)
  }
}
