package graft.ext

import graft.SparkSpec

/** Pins the integer-PageRank semantics against an in-memory reference
  * loop (exact equality — the arithmetic is designed to be replayable),
  * plus ranking invariants on the real corpus graph.
  */
class GraphQueriesSpec extends SparkSpec {

  private val Scale = 1000000000000L

  /** Plain-Scala replica: symmetrize, integer contributions
    * `rank div deg`, damping `(15·S + 85·Σ) div 100`, 3 rounds.
    */
  private def refRank(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = (edges ++ edges.map(_.swap)).distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> Scale).toMap
    for (_ <- 1 to 3) {
      val contribs = e.groupBy(_._2).map { case (t, in) =>
        t -> in.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = contribs.map { case (n, sum) => n -> (15L * Scale + 85L * sum) / 100L }
    }
    rank
  }

  test("distributed ranks == reference loop on a crafted graph") {
    import spark.implicits._
    // star (0 hub) + a 3-cycle + a pendant pair: mixes degrees 1..4
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (5L, 6L), (6L, 7L), (7L, 5L), (8L, 9L))
    val got = GraphQueries.pageRankOn(edges.toDF("s", "t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = refRank(edges)
    // query returns top-20; the crafted graph has 10 nodes, so totals match
    assert(got == want)
    // the hub of the star must outrank its leaves
    assert(want(0L) > want(1L))
  }

  /** Personalized replica: teleport mass only on seeds, rank0 = seed
    * indicator · Scale, update `(15·tp + 85·Σ) div 100`.
    */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long]): Map[Long, Long] = {
    val e = (edges ++ edges.map(_.swap)).distinct
    val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    def tp(n: Long) = if (seeds(n)) Scale else 0L
    var rank = deg.keys.map(n => n -> tp(n)).toMap
    for (_ <- 1 to 3) {
      val contribs = e.groupBy(_._2).map { case (t, in) =>
        t -> in.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = contribs.map { case (n, sum) => n -> (15L * tp(n) + 85L * sum) / 100L }
    }
    rank.filter(_._2 > 0)
  }

  test("personalized ranks == reference loop; mass localizes at the seeds") {
    import spark.implicits._
    // same crafted graph; seeds = the 3-cycle's nodes — the star and
    // the pendant pair are unreachable from the seeds, so their rank
    // must be exactly 0 (filtered out of both forms)
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L),
      (5L, 6L), (6L, 7L), (7L, 5L), (8L, 9L))
    val seeds = Set(5L, 6L)
    val got = GraphQueries.pprOn(edges.toDF("s", "t"),
        seeds.toSeq.toDF("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = refPpr(edges, seeds)
    assert(got == want)
    assert(got.keySet == Set(5L, 6L, 7L), s"mass escaped the component: $got")
    // seeds outrank the non-seed cycle member (teleport bias)
    assert(got(5L) > got(7L) && got(6L) > got(7L))
  }

  test("corpus ranks are positive, distinct-node, and correctly ordered") {
    val rows = GraphQueries.pageRank(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 20)
    assert(rows.map(_._1).distinct.length == 20)
    assert(rows.forall(_._2 > 0))
    val ranks = rows.map(_._2).toSeq
    assert(ranks.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }
  test("degree-ordered triangle counts == brute force on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(8)
      val edges = (for {
        u <- 0L until n; v <- (u + 1) until n
        if rnd.nextDouble() < 0.35
      } yield (u, v)).toSeq
      if (edges.nonEmpty) {
        val adj = edges.toSet
        def has(a: Long, b: Long) = adj.contains(if (a < b) (a, b) else (b, a))
        val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for {
          a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
          if has(a, b) && has(a, c) && has(b, c)
        } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
        val got = GraphQueries.trianglesOn(edges.toDF("u", "v"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == brute.toMap, s"trial $trial, n=$n, edges=$edges")
      }
    }
  }

  test("frontier BFS min-hops == brute force on random directed graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 10 + rnd.nextInt(10)
      val edges = (for {
        u <- 0L until n; v <- 0L until n
        if u != v && rnd.nextDouble() < 0.15
      } yield (u, v)).toSeq
      val seeds = (0L until n).filter(_ => rnd.nextDouble() < 0.2) match {
        case s if s.isEmpty => Seq(0L)
        case s => s
      }
      val maxHops = 1 + rnd.nextInt(3)
      // brute force: level-synchronous BFS over the adjacency map
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val dist = scala.collection.mutable.Map(seeds.map(_ -> 0): _*)
      var frontier = seeds.toSet
      for (h <- 1 to maxHops) {
        frontier = frontier.flatMap(u => adj.getOrElse(u, Set.empty))
          .filterNot(dist.contains)
        frontier.foreach(v => dist(v) = h)
      }
      val got = GraphQueries.bfsHopsOn(edges.toDF("s", "t"),
          seeds.toDF("node"), maxHops)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == dist.toMap, s"trial $trial, n=$n, seeds=$seeds, maxHops=$maxHops")
    }
  }

  test("synchronous LPA labels == brute force on random symmetric graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(10)
      val und = (for {
        u <- 0L until n; v <- (u + 1) until n
        if rnd.nextDouble() < 0.3
      } yield (u, v)).toSeq
      if (und.nonEmpty) {
        val edges = und ++ und.map(_.swap)
        val rounds = 1 + rnd.nextInt(3)
        // brute force: synchronous most-frequent-neighbor, tie → min label
        val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
        var label: Map[Long, Long] =
          edges.map(_._1).distinct.map(v => v -> v).toMap
        for (_ <- 1 to rounds) {
          label = label.map { case (v, _) =>
            val counts = adj(v).map(label).groupBy(identity)
              .map { case (l, occ) => (l, occ.size) }
            v -> counts.minBy { case (l, c) => (-c, l) }._1
          }
        }
        val got = GraphQueries.lpaOn(edges.toDF("s", "t"), rounds)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == label, s"trial $trial, n=$n, rounds=$rounds, edges=$und")
      }
    }
  }

  test("k-round relaxation == exhaustive ≤k-edge path search on random weighted graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(8)
      val edges = (for {
        u <- 0L until n; v <- 0L until n
        if u != v && rnd.nextDouble() < 0.2
      } yield (u, v, 1L + rnd.nextInt(9))).toSeq
      val seeds = (0L until n).filter(_ => rnd.nextDouble() < 0.25) match {
        case s if s.isEmpty => Seq(0L)
        case s => s
      }
      val rounds = 1 + rnd.nextInt(3)
      // brute force: min cost over ALL paths of ≤ rounds edges
      val adj = edges.groupBy(_._1).view
        .mapValues(_.map(e => (e._2, e._3))).toMap
      val best = scala.collection.mutable.Map(seeds.map(_ -> 0L): _*)
      var level = seeds.map(s => (s, 0L))
      for (_ <- 1 to rounds) {
        level = level.flatMap { case (u, c) =>
          adj.getOrElse(u, Seq.empty).map { case (v, w) => (v, c + w) }
        }
        level.foreach { case (v, c) =>
          if (!best.contains(v) || c < best(v)) best(v) = c
        }
      }
      val got = GraphQueries.minCostOn(edges.toDF("s", "t", "w"),
          seeds.toDF("node"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == best.toMap, s"trial $trial, n=$n, seeds=$seeds, rounds=$rounds")
    }
  }

  test("Adamic-Adar scores == brute force on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(8)
      val edges = (for {
        u <- 0L until n; v <- (u + 1) until n
        if rnd.nextDouble() < 0.3
      } yield (u, v)).toSeq
      if (edges.nonEmpty) {
        // brute force with the SAME integer-micros contribution
        val nbrs = (edges ++ edges.map(_.swap)).groupBy(_._1).view
          .mapValues(_.map(_._2).toSet).toMap
        def contrib(z: Long): Long = {
          val lnm = math.floor(
            math.log(nbrs(z).size.toDouble) * 1000000).toLong
          (2L * 1000000000000L + lnm) / (2L * lnm)
        }
        val want = (for {
          a <- nbrs.keys; b <- nbrs.keys if a < b
          if !edges.contains((a, b))
          common = nbrs(a) intersect nbrs(b)
          if common.nonEmpty
        } yield ((a, b), (common.size.toLong, common.toSeq.map(contrib).sum)))
          .toMap
        val got = GraphQueries.adamicAdarOn(edges.toDF("u", "v"))
          .collect()
          .map(r => ((r.getLong(0), r.getLong(1)),
            (r.getLong(2), r.getLong(3)))).toMap
        assert(got == want, s"trial $trial, n=$n")
      }
    }
  }

  /** Borůvka reference under the same (w DESC, u, v) total order — the
    * oracle's algorithm, independently re-implemented: per round, each
    * component picks its best exit edge; consistent tie-breaking makes
    * the result THE unique MSF, so it must equal the engine's Kruskal.
    */
  private def boruvkaRef(es: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    var comp = nodes.map(n => n -> n).toMap
    var sel = Set.empty[(Long, Long, Long)]
    var changed = true
    while (changed) {
      val out = es.filter(e => comp(e._1) != comp(e._2))
      val best = out.flatMap(e => Seq(comp(e._1) -> e, comp(e._2) -> e))
        .groupBy(_._1).values
        .map(_.map(_._2).minBy { case (u, v, w) => (-w, u, v) }).toSet
      changed = best.nonEmpty
      sel ++= best
      // relabel components = CC over selected edges (min label)
      var stable = false
      while (!stable) {
        val next = comp.map { case (n, c) =>
          val nb = sel.collect {
            case (u, v, _) if u == n => comp(v)
            case (u, v, _) if v == n => comp(u)
          }
          n -> (nb + c).min
        }
        stable = next == comp
        comp = next
      }
    }
    sel
  }

  test("Kruskal MSF == Boruvka reference on random weighted graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 12) {
      val n = 4 + rnd.nextInt(12)
      val es = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.45
      } yield (a, b, (1 + rnd.nextInt(5)).toLong)).toSeq // heavy ties
      val kruskal = GraphQueries.kruskalMsf(es)
        .map { case (u, v, w, _) => (u, v, w) }.toSet
      assert(kruskal == boruvkaRef(es), s"trial $trial, n=$n, es=$es")
      // forest invariants: |edges| = |nodes| − |components|
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.toSet
      val trees = GraphQueries.kruskalMsf(es).map(_._4).distinct.size
      if (nodes.nonEmpty)
        assert(kruskal.size == nodes.size - trees)
    }
  }
}
