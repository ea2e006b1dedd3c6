package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.closure.{ClosureExtractor, TraversalPolicy}
import graft.meta.{Catalog, FkEdge, TableMeta}
import graft.sanitize.{ColumnRule, Sanitizer}
import graft.sqlparse.SeedQuery

/** Property-style invariants (SURVEY.md §5.2) driven by scalacheck
  * generators. Spark-touching properties use a handful of generated cases
  * (each case runs real jobs); pure ones use many.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cases[T](g: Gen[T], n: Int): Seq[T] = {
    val seed0 = rng.Seed(42L)
    Iterator.iterate((g.pureApply(Gen.Parameters.default, seed0), seed0.next)) {
      case (_, s) => (g.pureApply(Gen.Parameters.default, s), s.next)
    }.map(_._1).take(n).toSeq
  }

  // ---- pure: template substitution vs a model implementation ----

  test("substitute() agrees with a naive model on random templates") {
    val attr = Gen.oneOf("id", "username", "x1")
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(5)),
      attr.map(a => s"{$a}"),
      Gen.const("{unknown}"), Gen.const("}{"), Gen.const("{"))
    val tmpl = Gen.listOfN(6, piece).map(_.mkString)
    val row = Map[String, Any]("id" -> 7L, "username" -> "jo", "x1" -> 1.5)
    def model(t: String): String = {
      val sb = new StringBuilder; var i = 0
      while (i < t.length) {
        val m = raw"\{(\w+)\}".r.findPrefixMatchOf(t.substring(i))
        m match {
          case Some(mm) if row.contains(mm.group(1)) =>
            sb.append(row(mm.group(1)).toString); i += mm.matched.length
          case Some(mm) => sb.append(mm.matched); i += mm.matched.length
          case None => sb.append(t(i)); i += 1
        }
      }
      sb.toString
    }
    cases(tmpl, 200).foreach { t =>
      assert(SeedQuery.substitute(t, row) == model(t), s"template: $t")
    }
  }

  test("Sanitizer.template column agrees with substitute() row-wise") {
    val df = Seq((1L, "jo"), (42L, "max")).toDF("id", "username")
    val tmpls = cases(Gen.listOfN(4,
      Gen.oneOf(Gen.const("{id}"), Gen.const("{username}"),
        Gen.alphaNumStr.map(_.take(4)))).map(_.mkString), 20)
    val cols = tmpls.zipWithIndex.map { case (t, i) => Sanitizer.template(t).as(s"c$i") }
    val rows = df.select((col("id") +: col("username") +: cols): _*).collect()
    rows.foreach { r =>
      val m = Map[String, Any]("id" -> r.getLong(0), "username" -> r.getString(1))
      tmpls.zipWithIndex.foreach { case (t, i) =>
        assert(r.getAs[String](s"c$i") == SeedQuery.substitute(t, m), s"template: $t")
      }
    }
  }

  // ---- Spark: closure invariants on the micro-graph ----

  private lazy val user = Seq(
    (1L, Option(10L)), (2L, Option.empty[Long]), (3L, Option(30L)), (4L, Option(20L))
  ).toDF("id", "best_project_id")
  private lazy val project = Seq(
    (10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L)).toDF("id", "owner_id")
  private lazy val comment = Seq(
    (100L, 10L, 2L), (101L, 20L, 1L), (102L, 40L, 3L), (103L, 30L, 4L)
  ).toDF("id", "project_id", "author_id")

  private val catalog = Catalog(
    tables = Map(
      "user" -> TableMeta("user", Seq("id")),
      "project" -> TableMeta("project", Seq("id")),
      "comment" -> TableMeta("comment", Seq("id"))),
    edges = Seq(
      FkEdge("u_bp", "user", "best_project_id", "project", "id"),
      FkEdge("p_o", "project", "owner_id", "user", "id"),
      FkEdge("c_p", "comment", "project_id", "project", "id"),
      FkEdge("c_a", "comment", "author_id", "user", "id")))

  private def tbl(n: String) = n match {
    case "user" => user; case "project" => project; case "comment" => comment
  }

  private def closure(seedIds: Set[Long], policy: TraversalPolicy) =
    new ClosureExtractor(catalog, tbl, policy)
      .extract("user", user.filter(col("id").isin(seedIds.toSeq: _*)))
      .map { case (t, df) => t -> df.select("id").collect().map(_.getLong(0)).toSet }

  private val genSeed = Gen.someOf(1L, 2L, 3L, 4L).map(_.toSet).suchThat(_.nonEmpty)
  private val genPolicy = for {
    omit <- Gen.oneOf(true, false)
    allow <- Gen.someOf("c_p", "c_a", "p_o", "u_bp")
  } yield TraversalPolicy(omit, allow.toSet)

  test("closure is FK-closed, idempotent, and monotone in the seed") {
    val ps = cases(Gen.zip(genSeed, genPolicy), 5)
    ps.foreach { case (seed, policy) =>
      val out = closure(seed, policy)
      // FK-closed: every followed-forward edge lands inside the output
      for (e <- catalog.edges if out.contains(e.childTable)) {
        val children = tbl(e.childTable)
          .filter(col("id").isin(out(e.childTable).toSeq: _*))
          .select(e.childCol).collect().flatMap(r => Option(r.get(0)))
          .map(_.asInstanceOf[Long]).toSet
        assert(children.subsetOf(out.getOrElse(e.parentTable, Set.empty)),
          s"dangling ${e.name} seed=$seed policy=$policy")
      }
      // idempotent
      assert(closure(seed, policy) == out, s"not idempotent seed=$seed")
      // monotone: adding a seed row never shrinks any table's key set
      val bigger = closure(seed + 1L, policy)
      out.foreach { case (t, ks) =>
        assert(ks.subsetOf(bigger.getOrElse(t, Set.empty)),
          s"not monotone at $t seed=$seed policy=$policy")
      }
    }
  }

  // ---- Spark: sanitize determinism/uniqueness over random id sets ----

  test("unique fakes never collide for arbitrary id sets") {
    val ids = cases(Gen.listOfN(30, Gen.chooseNum(1L, 100000L)).map(_.distinct), 3)
    ids.foreach { xs =>
      val df = xs.toDF("id").withColumn("phone", lit("x"))
      val out = Sanitizer(df, Seq(ColumnRule("phone",
        fake = Some("phone_number"), unique = true)), "id")
      assert(out.select("phone").distinct().count() == xs.length.toLong)
    }
  }
}
