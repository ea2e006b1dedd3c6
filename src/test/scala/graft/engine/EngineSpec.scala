package graft.engine

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.conf.ExtractConfig
import graft.meta.{Catalog, FkEdge, TableMeta}

/** End-to-end engine flow on the mover-shaped micro-fixture
  * (FIXTURES.md §B): seed SQL → closure → sanitize → JSON artifacts →
  * load-back.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val user = Seq(
    (1L, "alice", "Alice A", "alice@real.com", "pw1", Option(10L)),
    (2L, "bob", "Bob B", "bob@real.com", "pw2", Option.empty[Long]),
    (3L, "carol", "Carol C", "carol@real.com", "pw3", Option(30L))
  ).toDF("id", "username", "name", "email", "password", "best_project_id")
  private lazy val project = Seq(
    (10L, 1L, "p-alice"), (20L, 2L, "p-bob"), (30L, 3L, "p-carol")
  ).toDF("id", "owner_id", "title")
  private lazy val comment = Seq(
    (100L, 10L, 2L, "hi"), (101L, 20L, 1L, "yo")
  ).toDF("id", "project_id", "author_id", "body")
  private lazy val region = Seq((1, "EXTRA")).toDF("r_id", "r_name")
  private lazy val badge = Seq((500L, 3L, "gold")).toDF("id", "user_id", "label")

  private val catalog = Catalog(
    tables = Map(
      "user" -> TableMeta("user", Seq("id")),
      "project" -> TableMeta("project", Seq("id")),
      "comment" -> TableMeta("comment", Seq("id")),
      "region" -> TableMeta("region", Seq("r_id")),
      "badge" -> TableMeta("badge", Seq("id"))),
    edges = Seq(
      FkEdge("user_best_project_fkey", "user", "best_project_id", "project", "id"),
      FkEdge("project_owner_fkey", "project", "owner_id", "user", "id"),
      FkEdge("comment_project_fkey", "comment", "project_id", "project", "id"),
      FkEdge("comment_author_fkey", "comment", "author_id", "user", "id"),
      FkEdge("badge_user_fkey", "badge", "user_id", "user", "id")))

  private def tables(name: String): DataFrame = name match {
    case "user" => user; case "project" => project
    case "comment" => comment; case "region" => region
    case "badge" => badge
  }

  private val config = ExtractConfig.fromJson(
    """{
      |  "locale": "fr",
      |  "schema": [{
      |    "table_name": "user",
      |    "columns": [
      |      {"name": "name",  "replace": "{username}"},
      |      {"name": "email", "replace": "ulule-{id}@ulule.com"},
      |      {"name": "password", "sanitize": true}
      |    ]
      |  }],
      |  "extra": [{"table_name": "region"}]
      |}""".stripMargin)

  private def engine = new Engine(spark, catalog, tables, config)

  test("extract: seed SQL drives closure + sanitize + extras") {
    val out = engine.extract("SELECT * FROM user WHERE id = 1")
    // user 1 -> project 10 (FK) -> owner 1 (seen); RKs from seed: project
    // 10 (owner), comments by author 1 -> comment 101 -> project 20 -> user 2
    assert(out.keySet == Set("user", "project", "comment", "region"))
    val u = out("user").orderBy("id").collect()
    assert(u.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // sanitize applied: name replaced by username, email templated, pw null
    assert(u(0).getAs[String]("name") == "alice")
    assert(u(0).getAs[String]("email") == "ulule-1@ulule.com")
    assert(u.forall(_.isNullAt(u(0).fieldIndex("password"))))
    // extra table pulled wholesale, unsanitized
    assert(out("region").count() == 1L)
  }

  test("extractTo + load round-trip through JSON artifacts") {
    val dir = Files.createTempDirectory("engine-e2e").toString
    val counts = engine.extractTo("SELECT * FROM user WHERE id = 1", dir)
    assert(counts("user") == 2L && counts.contains("region"))
    val back = engine.load(dir)
    assert(back.keySet == counts.keySet)
    assert(back("user").count() == 2L)
    // sanitized values survived the round trip
    val u = back("user").orderBy("id").collect()(0)
    assert(u.getAs[String]("email") == "ulule-1@ulule.com")
  }

  test("extractDelta: incremental and fallback forms agree table-by-table") {
    // previous export = closure of user 1 (with extras); new seed widens
    // to users {1,3}. The incremental form prunes inside the BFS, the
    // fallback re-extracts and anti-joins per pk — same delta, including
    // the depth-0 expansion of the genuinely-new seed (user 3 → badge).
    val prevKeys = engine.extract("SELECT * FROM user WHERE id = 1")
      .map { case (t, df) => t -> df.select(catalog.pkOf(t).map(col): _*) }
    def sets(m: Map[String, DataFrame]): Map[String, Set[Long]] = m.map {
      case (t, df) => t -> df.select(catalog.pkOf(t).head).collect()
        .map(_.getAs[Any](0).toString.toLong).toSet
    }.filter(_._2.nonEmpty)
    val inc = sets(engine.extractDelta(
      "SELECT * FROM user WHERE id IN (1, 3)", prevKeys))
    val fb = sets(engine.extractDelta(
      "SELECT * FROM user WHERE id IN (1, 3)", prevKeys, incremental = false))
    assert(inc == fb, s"inc=$inc\nfb=$fb")
    // and the delta is the user-3 subgraph: project 30, carol's badge
    assert(inc("user") == Set(3L) && inc("project") == Set(30L) &&
      inc("badge") == Set(500L), s"inc=$inc")
  }

  test("recurring lifecycle on GROWN data: prev + incremental delta == full re-extract") {
    // the production append-only shape, end to end through artifacts:
    // export a base, the source then GROWS (a new seed row, a new
    // comment under an OLD author — only reachable via the allowlisted
    // reverse edge's refire — and a new comment under the new seed),
    // extract -delta against the base, merge, and the merged base must
    // equal a full re-extract of the grown source, table by table.
    val cfg = ExtractConfig.fromJson(
      """{"schema": [{"table_name": "project",
        |  "reference_keys": ["comment_project_fkey"]}]}""".stripMargin)
    val seedSql = "SELECT * FROM user WHERE id <= 9"
    val prevDir = Files.createTempDirectory("engine-grow-prev").toString
    val deltaDir = Files.createTempDirectory("engine-grow-delta").toString
    new Engine(spark, catalog, tables, cfg).extractTo(seedSql, prevDir)
    // grow: user 5 (a NEW seed row), comment 105 under it, and the
    // refire-critical case — comment 104 on OLD project 20 by NON-seed
    // user 11: projects are never seeds, so 104 (and user 11 behind its
    // author FK) is reachable ONLY by re-probing old projects'
    // allowlisted reverse edge against the grown comment table
    val grownUser = user.unionByName(Seq(
      (5L, "eve", "Eve E", "eve@real.com", "pw5", Option(20L)),
      (11L, "zed", "Zed Z", "zed@real.com", "pw11", Option.empty[Long])
    ).toDF("id", "username", "name", "email", "password", "best_project_id"))
    val grownComment = comment.unionByName(Seq(
      (104L, 20L, 11L, "appended-on-old-project-by-non-seed"),
      (105L, 30L, 5L, "appended-under-new-seed")
    ).toDF("id", "project_id", "author_id", "body"))
    val grown: String => DataFrame = {
      case "user" => grownUser; case "comment" => grownComment
      case t => tables(t)
    }
    val e2 = new Engine(spark, catalog, grown, cfg)
    val deltaCounts = e2.extractDeltaTo(seedSql, deltaDir, prevDir)
    assert(deltaCounts.getOrElse("comment", 0L) == 2L &&
      deltaCounts.getOrElse("user", 0L) == 2L, s"delta=$deltaCounts")
    graft.io.JsonTableIO.mergeArtifacts(spark, prevDir, deltaDir)
    val full = e2.extract(seedSql)
    val merged = e2.load(prevDir)
    full.foreach { case (t, df) =>
      val pk = catalog.pkOf(t).head
      def keys(d: DataFrame): Set[Long] =
        d.select(pk).collect().map(_.getAs[Any](0).toString.toLong).toSet
      assert(merged.contains(t) && keys(merged(t)) == keys(df),
        s"$t: merged=${merged.get(t).map(keys)} full=${keys(df)}")
    }
  }

  test("load ingests a mover-authored export dir (single-file envelopes, ref loader.go:25-72)") {
    // the artifact a migrating mover user actually has: one pretty-printed
    // <table>.json per table, no manifest subdirs
    val dir = Files.createTempDirectory("mover-export").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/user.json"),
      "{\n\t\"table_name\": \"user\",\n\t\"count\": 1,\n\t\"data\": [\n" +
        "\t\t{\n\t\t\t\"id\": 1,\n\t\t\t\"username\": \"alice\",\n" +
        "\t\t\t\"name\": \"Alice A\",\n\t\t\t\"email\": \"a@x.com\",\n" +
        "\t\t\t\"password\": null,\n\t\t\t\"best_project_id\": 10\n\t\t}\n\t]\n}")
    Files.writeString(java.nio.file.Paths.get(s"$dir/project.json"),
      "{\n\t\"table_name\": \"project\",\n\t\"count\": 1,\n\t\"data\": [\n" +
        "\t\t{\n\t\t\t\"id\": 10,\n\t\t\t\"owner_id\": 1,\n" +
        "\t\t\t\"title\": \"p-alice\"\n\t\t}\n\t]\n}")
    val back = engine.load(dir)
    assert(back.keySet == Set("user", "project"))
    val u = back("user").collect()(0)
    assert(u.getAs[Long]("id") == 1L && u.getAs[String]("username") == "alice")
    assert(u.isNullAt(u.fieldIndex("password")))
    assert(back("project").collect()(0).getAs[Long]("owner_id") == 1L)
  }

  test("extras expand their own closure (ref etl/engine.go:117-125)") {
    val cfg = ExtractConfig.fromJson("""{"extra": [{"table_name": "badge"}]}""")
    val out = new Engine(spark, catalog, tables, cfg)
      .extract("SELECT * FROM user WHERE id = 2")
    // badge 500 belongs to user 3, reachable ONLY via the extra's FK edge:
    // a bare full-table pull would leave user 3 out of the export and the
    // artifact referentially broken
    assert(out("badge").count() == 1L)
    assert(out("user").collect().map(_.getLong(0)).toSet.contains(3L))
  }

  test("extra equal to the seed table exports the WHOLE table (ref runs Handle per extra unconditionally)") {
    val cfg = ExtractConfig.fromJson("""{"extra": [{"table_name": "user"}]}""")
    val out = new Engine(spark, catalog, tables, cfg)
      .extract("SELECT * FROM user WHERE id = 1")
    assert(out("user").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("null/non-http download config is skipped, not fatal") {
    val cfg = ExtractConfig.fromJson(
      """{"schema": [{"table_name": "user",
        |  "columns": [{"name": "name", "download": {"type": "s3", "http": null}}]}]}""".stripMargin)
    val out = Files.createTempDirectory("engine-nodl").toString
    // must not NPE; no media dir materializes
    new Engine(spark, catalog, tables, cfg)
      .extractTo("SELECT * FROM user WHERE id = 1", out)
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/media")))
  }

  test("config-driven media download during extractTo (ref etl/engine.go:166-175)") {
    val src = Files.createTempDirectory("media-src")
    Files.writeString(src.resolve("a.bin"), "IMG")
    val cfg = ExtractConfig.fromJson(
      s"""{"schema": [{"table_name": "user",
         |  "columns": [{"name": "avatar",
         |    "download": {"type": "http", "http": {"base_url": "file://$src/"}}}]}]}""".stripMargin)
    val withAvatar: String => DataFrame = {
      case "user" => user.withColumn("avatar",
        when($"id" === 1L, lit("a.bin")).otherwise(lit(null: String)))
      case n => tables(n)
    }
    val out = Files.createTempDirectory("engine-dl").toString
    new Engine(spark, catalog, withAvatar, cfg)
      .extractTo("SELECT * FROM user WHERE id = 1", out)
    // layout mirrors MediaDownloader: <out>/media/<full-url-path>
    assert(Files.readString(
      java.nio.file.Paths.get(s"$out/media$src/a.bin")) == "IMG")
  }

  test("describe prints keys and edges (ref engine.go:89-96)") {
    val d = engine.describe("user")
    assert(d.contains("primary key: id"))
    assert(d.contains("FK best_project_id -> project(id)"))
    assert(d.contains("RK comment(author_id) -> id"))
    intercept[NoSuchElementException](engine.describe("nope"))
  }

  test("config queries (J3) pull correlated rows without an RK edge") {
    // comments by the seed user, via templated query instead of the
    // comment_author_fkey reverse edge (ref etl/extractor.go:70-79)
    val cfg = ExtractConfig.fromJson(
      """{
        |  "schema": [{
        |    "table_name": "user",
        |    "omit_reference_keys": true,
        |    "queries": [{"table_name": "comment",
        |      "query": "SELECT * FROM comment WHERE author_id = {id}"}]
        |  }]
        |}""".stripMargin)
    val out = new Engine(spark, catalog, tables, cfg)
      .extract("SELECT * FROM user WHERE id = 1")
    // user 1 wrote comment 101 (on project 20) -> project 20 -> owner
    // bob(2); queries run for EVERY user entering the extract (the
    // reference gates only RKs by depth), so bob's comment 100 follows
    assert(out("comment").orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(100L, 101L))
    assert(out("project").orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(10L, 20L))
  }

  test("omit_reference_keys config suppresses reverse expansion") {
    val cfg = ExtractConfig.fromJson(
      """{"schema": [{"table_name": "user", "omit_reference_keys": true}]}""")
    val out = new Engine(spark, catalog, tables, cfg)
      .extract("SELECT * FROM user WHERE id = 1")
    assert(!out.contains("comment"))
    assert(out("user").count() == 1L)
  }
}
