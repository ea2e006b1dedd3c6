package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup absorbs JVM/codegen/parquet-footer startup cost so the
    // recorded per-query numbers approximate steady state: one scan-agg
    // query, plus the closure at the smallest sf (the BFS compiles many
    // unique plan shapes; first-run codegen otherwise lands on whichever
    // closure query sorts first)
    // noop sink executes the FULL physical plan — count() lets Catalyst
    // prune every projection, so a narrow scan→project query would be
    // timed as scan-only (this hid a 100× projection bug in simhash)
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // sf0.001 warmups compile the two iterative families' plan shapes
    // (BFS semi/anti joins; signature pipeline + CC label rounds) so
    // first-use codegen doesn't bill to whichever query sorts first.
    // One try PER warmup: a failure in one must not skip the others.
    def warm(q: String, dir: String): Unit =
      try SparkEntry.queries.get(q).foreach(f => run(f(spark, dir)))
      catch { case NonFatal(_) => () }
    warm("q1_agg", sfDir)
    warm("closure_extract", "/root/testdata/sf0.001")
    warm("dedup_clusters", "/root/testdata/sf0.001")
    spark.catalog.clearCache()
    // optional comma-separated query filter for local iteration; the
    // driver sets no filter and measures the full suite
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    // n runs per query, MEDIAN recorded: single-shot timings on a busy
    // host showed ≥2× per-query swings round-over-round that were pure
    // scheduling noise (r5 recorded minhash_pairs at 6.9 s; median-of-3
    // on the same code is 1.5 s). The median of 3 is robust to one bad
    // run and keeps the full 81-query suite under ~5 min.
    // floored at 1: runs=0 would make median() index an empty sequence and
    // abort the whole suite with an opaque IndexOutOfBounds
    // default 3 separated passes (min-of-3): with 2, one stalled pass
    // leaves a single sample and a transient host stall reads as a
    // regression; 3 keeps two independent samples through any one stall
    val runs = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3))
    val queryList = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Two properties the recorded number must have, and how each is won:
    //
    // WARM — every timed run is immediately preceded by an UNTIMED
    // warmup of the same query. Spark's generated-class cache holds 100
    // plans and the JIT code cache is bounded, so nothing stays warm
    // across a 260+-query sweep; a fully interleaved timed sweep (tried
    // in r12) measured every query cold and inflated the suite a
    // uniform ~2.2× (word_counts 0.15→0.43 s with zero code diff) —
    // incomparable with the warm-recorded baseline the gate is set
    // against. Warmth must be re-established per query, right before
    // its timed run; that is what the old back-to-back median did
    // implicitly (run 1 cold, runs 2–3 warm, median ≈ warm).
    //
    // STALL-ROBUST — the suite runs as `runs` (default 3) SEPARATED
    // full passes, and the recorded value is the MIN of a query's warm
    // samples across passes. Back-to-back samples share any transient
    // host stall: r10 recorded corr_matrix at 25.8 s on all three
    // consecutive runs, and the identical code re-benched at 1.44 s in
    // r11. With passes ~7 min apart a stall lands in at most one
    // sample, and min — the standard interference-free estimator —
    // discards it. A consistent regression shows in BOTH samples, so
    // min still reports it.
    // HOST-DRIFT CANARY: a pinned 6-query block (diverse cheap plan
    // shapes: scan-agg, projection, text agg, top-k window, json,
    // running window) timed warm BEFORE the first pass and AFTER the
    // last. The code under the canary never changes within a session,
    // so canary_ratio = last/first is a pure host-speed signal: a
    // suite total that moved together with the canary is drift, one
    // that moved against a flat canary is a regression. r13's gate
    // number moved 181→246→265 s across runs of an UNCHANGED tree;
    // this puts the disambiguating number in the artifact itself.
    def timedWarm(name: String): Double = {
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      try run(fn(spark, sfDir)) catch { case NonFatal(_) => () }
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try run(fn(spark, sfDir)) catch { case NonFatal(_) => () }
      (System.nanoTime() - t0) / 1e9
    }
    def canaryBlock(): Double =
      CanaryQueries.filter(SparkEntry.queries.contains).map(timedWarm).sum
    val canaryFirst = if (only.isEmpty) Some(canaryBlock()) else None
    val sweeps: Seq[Map[String, (Double, Option[String])]] =
      (1 to runs).map { _ =>
        queryList.map { case (name, fn) =>
          // warmup and timed run each pay their own reads: no cached
          // tables/views leak from one into the other
          spark.catalog.clearCache()
          try run(fn(spark, sfDir)) catch { case NonFatal(_) => () }
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val err = try { run(fn(spark, sfDir)); None }
                    catch { case NonFatal(e) => Some(e.toString.takeWhile(_ != '\n').take(200)) }
          name -> (((System.nanoTime() - t0) / 1e9, err))
        }.toMap
      }
    val canary = canaryFirst.map(first => (first, canaryBlock()))
    val results = queryList.map { case (name, _) =>
      val samples = sweeps.map(_(name))
      // any failed run fails the query — a flaky query must not hide
      // behind a clean min
      (name, samples.map(_._1).min, samples.flatMap(_._2).headOption)
    }
    val json = renderJson(results, sfDir, runs, canary)
    println(json)
    // The driver's round artifact keeps only a ~2000-char stdout TAIL —
    // at 260+ queries most per-query medians fall off it (r9 lost all
    // entries before 'r'). The repo-local copy is the durable record:
    // committed per round, it keeps round-over-round per-query
    // comparison possible from git history alone. Best-effort — a
    // read-only checkout must not fail the bench. FILTERED runs
    // (SPARK_GRAFT_BENCH_ONLY set) never touch it: a 2-query iteration
    // sweep must not clobber the committed full-suite record (it did,
    // twice, in r13 — the sf1 sweep overwrote the r12 reference).
    if (only.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(sys.props.getOrElse("user.dir", "."))
          .resolve("BENCH_LOCAL.json"), json + "\n")
      catch { case NonFatal(_) => () }
    spark.stop()
  }

  /** The pinned drift-canary block: cheap, stable, shape-diverse
    * registry queries. MUST stay fixed across rounds — the cross-round
    * comparability of canary seconds is the whole point.
    */
  val CanaryQueries: Seq[String] = Seq(
    "q1_agg", "scalar_funcs", "word_counts",
    "topk_per_group", "json_extract", "window_running")

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** One JSON result line. A failed query must NOT masquerade as a
    * near-zero timing: it goes into "errors" and is excluded from
    * "queries" and the total (BenchJsonSpec pins this).
    *
    * Key order matters for the DRIVER'S ARTIFACT, not the parser: the
    * round record keeps only the tail of stdout, so with 100+ per-query
    * entries a leading `"value"` gets truncated out of the certified
    * file. The headline total therefore comes LAST — the tail always
    * contains `..."metric":"total","value":N}` (BenchJsonSpec pins it).
    */
  def renderJson(results: Seq[(String, Double, Option[String])], sfDir: String,
                 runs: Int = 1, canary: Option[(Double, Double)] = None): String = {
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    // 3 dp: sub-millisecond digits are pure noise on a shared host, and
    // every digit costs tail budget in the driver's truncated capture
    def r3(v: Double): String =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val errsJson =
      if (results.exists(_._3.nonEmpty))
        results.collect { case (k, _, Some(m)) => s"\"" + k + "\":\"" + esc(m) + "\"" }
          .mkString(""","errors":{""", ",", "}")
      else ""
    // canary lands in the TAIL region (after the per-query map) so the
    // driver's truncated capture keeps it alongside the total
    val canaryJson = canary.fold("") { case (first, last) =>
      val ratio = if (first > 0) last / first else 1.0
      s""","canary_first":${r3(first)},"canary_last":${r3(last)},"canary_ratio":${r3(ratio)}"""
    }
    s"""{"queries":$qs$errsJson,"sf":"$sfDir","runs":$runs$canaryJson,"n_queries":${ok.size},"unit":"sec","metric":"total","value":${r3(total)}}"""
  }
}
