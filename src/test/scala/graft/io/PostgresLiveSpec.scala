package graft.io

import java.nio.file.{Files, Path}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, ResultSet, Statement}
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** LIVE-Postgres integration: boots a throwaway Postgres 15 cluster on a
  * unix socket (no TCP, no daemon, no docker) and executes the REAL SQL
  * this library generates — closing the one reference behavior the
  * embedded-Derby and recording-stub specs could not actually run:
  *
  *  - the upsert bracket (`dialect/postgres/postgres.go:64-97`): trigger
  *    disable → `INSERT … ON CONFLICT DO NOTHING` → trigger enable →
  *    `setval` sequence repair, asserted against live trigger firing,
  *    conflict skipping, and `nextval` state;
  *  - pg_catalog introspection (`postgres.go:100-403`): the four
  *    [[PgIntrospect]] queries run verbatim against a real catalog, and
  *    [[PgIntrospect.introspect]]'s client-side grouping runs unmodified
  *    over the live results through a minimal reflective JDBC shim.
  *
  * Environment-gated, never failing where Postgres is unavailable: every
  * test `assume`s the cluster booted (→ reported canceled, not failed).
  * Boot adapts to sandboxes that run as root (initdb refuses root: the
  * cluster is initialized and run via `runuser -u postgres` when a
  * postgres user exists).
  */
class PostgresLiveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var dir: Path = null
  private var up = false
  private var asPg: Seq[String] = Nil // runuser prefix when root

  private def sh(cmd: Seq[String]): (Int, String) = {
    val out = new StringBuilder
    val code = Process(cmd).!(ProcessLogger(s => out.append(s).append('\n'),
      s => out.append(s).append('\n')))
    (code, out.toString)
  }

  /** Run SQL as the `graft` superuser; fails the test on SQL error. */
  private def psql(sql: String): Seq[Array[String]] = {
    val (code, out) = sh(Seq("psql", "-h", dir.toString, "-U", "graft",
      "-d", "postgres", "-v", "ON_ERROR_STOP=1", "-At", "-F", "\u0001", "-c", sql))
    assert(code == 0, s"psql failed ($code): $out\nSQL: $sql")
    out.linesIterator.filter(_.nonEmpty).map(_.split('\u0001')).toSeq
  }

  override def beforeAll(): Unit = {
    try {
      val binDirs = Seq("", "/usr/local/bin/", "/usr/lib/postgresql/15/bin/")
      def find(b: String) = binDirs.map(_ + b)
        .find(p => sh(Seq("sh", "-c", s"command -v $p"))._1 == 0)
      (find("initdb"), find("pg_ctl"), find("psql")) match {
        case (Some(initdb), Some(pgctl), Some(_)) =>
          dir = Files.createTempDirectory("graft-pglive")
          if (sh(Seq("id", "-u"))._2.trim == "0" &&
              sh(Seq("id", "postgres"))._1 == 0) {
            asPg = Seq("runuser", "-u", "postgres", "--")
            sh(Seq("chown", "postgres:postgres", dir.toString))
          }
          val (c1, o1) = sh(asPg ++ Seq(initdb, "-D", s"$dir/data", "-U", "graft",
            "-A", "trust", "--no-sync"))
          assert(c1 == 0, o1)
          val (c2, o2) = sh(asPg ++ Seq(pgctl, "-D", s"$dir/data", "-w",
            "-o", s"-c listen_addresses='' -c unix_socket_directories=$dir",
            "-l", s"$dir/pg.log", "start"))
          assert(c2 == 0, o2)
          up = true
        case _ => () // no postgres binaries: every test assumes(up) → canceled
      }
    } catch { case _: Throwable => up = false }
  }

  override def afterAll(): Unit = if (dir != null) {
    Seq("/usr/local/bin/pg_ctl", "pg_ctl", "/usr/lib/postgresql/15/bin/pg_ctl")
      .view.map(p => sh(asPg ++ Seq(p, "-D", s"$dir/data", "stop", "-m", "fast")))
      .find(_._1 == 0)
    sh(Seq("rm", "-rf", dir.toString))
  }

  /** Substitute JDBC `?` binds with SQL literals — the spec executes the
    * exact generated statement text through psql instead of a driver.
    */
  private def bind(sql: String, args: Seq[String]): String =
    args.foldLeft(sql)((s, a) => s.replaceFirst("\\?", a))

  test("upsert bracket live: triggers silenced, conflicts skipped, sequence repaired") {
    assume(up, "no live Postgres in this environment")
    psql("""CREATE TABLE "users" ("id" bigserial PRIMARY KEY, "name" text);
      |CREATE TABLE "audit" ("id" bigserial PRIMARY KEY, "msg" text);
      |CREATE FUNCTION users_audit() RETURNS trigger AS
      |  $$ BEGIN INSERT INTO "audit"("msg") VALUES ('fired'); RETURN NEW; END $$
      |  LANGUAGE plpgsql;
      |CREATE TRIGGER users_trg AFTER INSERT ON "users"
      |  FOR EACH ROW EXECUTE FUNCTION users_audit();
      |INSERT INTO "users"("name") VALUES ('a'), ('b');
      |DELETE FROM "audit";""".stripMargin)

    // the bracket, statement for statement as PostgresUpsert executes it
    psql(UpsertJdbcSink.triggerSql("users", enable = false)) // preLoad
    val ins = UpsertJdbcSink.insertSql("users", Seq("id", "name"), "id")
    psql(bind(ins, Seq("1", "'a-dup'"))) // pk conflict → skipped
    psql(bind(ins, Seq("3", "'c'")))
    psql(bind(ins, Seq("10", "'z'"))) // max(pk) now ahead of the sequence
    psql(UpsertJdbcSink.triggerSql("users", enable = true)) // postLoad
    val seq = psql(UpsertJdbcSink.sequenceNameSql("users", "id")).head.head
    assert(seq.endsWith("users_id_seq"), seq)
    psql(UpsertJdbcSink.setvalSql(seq, "users", "id"))

    // conflict row skipped, new rows in
    assert(psql("""SELECT "id", "name" FROM "users" ORDER BY "id"""")
      .map(r => (r(0), r(1))) == Seq("1" -> "a", "2" -> "b", "3" -> "c", "10" -> "z"))
    // triggers were DISABLED for every bracket insert
    assert(psql("""SELECT count(*) FROM "audit"""").head.head == "0")
    // sequence repaired to max+1 (setval(…, false) → nextval returns it)
    assert(psql(s"SELECT nextval('$seq')").head.head == "11")
    // and the trigger is live again after the bracket
    psql("""INSERT INTO "users"("name") VALUES ('post-bracket')""")
    assert(psql("""SELECT count(*) FROM "audit"""").head.head == "1")
  }

  // ---- introspection: real catalog, real grouping code ----

  /** Minimal JDBC shim: Connection/Statement backed by psql, ResultSet
    * over its rows — just enough surface for [[PgIntrospect.introspect]]
    * (createStatement / executeQuery / next / getString / getBoolean /
    * getInt), so the PRODUCTION grouping code runs against live results.
    */
  private def psqlConnection(): Connection = {
    def proxy[T](cls: Class[T])(h: (Method, Array[AnyRef]) => AnyRef): T =
      Proxy.newProxyInstance(cls.getClassLoader, Array(cls),
        new InvocationHandler {
          def invoke(p: AnyRef, m: Method, a: Array[AnyRef]): AnyRef = h(m, a)
        }).asInstanceOf[T]
    def resultSet(rows: Seq[Array[String]]): ResultSet = {
      var i = -1
      proxy(classOf[ResultSet]) { (m, a) =>
        def cell = rows(i)(a(0).asInstanceOf[Integer] - 1) match {
          case "" => null; case v => v
        }
        m.getName match {
          case "next" => i += 1; java.lang.Boolean.valueOf(i < rows.length)
          case "getString" => cell
          case "getBoolean" => java.lang.Boolean.valueOf(cell == "t")
          case "getInt" => Integer.valueOf(if (cell == null) 0 else cell.toInt)
          case "close" => null
          case n => throw new UnsupportedOperationException(n)
        }
      }
    }
    proxy(classOf[Connection]) { (m, _) =>
      m.getName match {
        case "createStatement" => proxy(classOf[Statement]) { (sm, sa) =>
          sm.getName match {
            case "executeQuery" => resultSet(psql(sa(0).asInstanceOf[String]))
            case "close" => null
            case n => throw new UnsupportedOperationException(n)
          }
        }
        case "close" => null
        case n => throw new UnsupportedOperationException(n)
      }
    }
  }

  test("pg_catalog introspection live: tables, columns, pks, fk edges") {
    assume(up, "no live Postgres in this environment")
    psql("""CREATE TABLE "dept" ("id" bigserial PRIMARY KEY, "dname" text NOT NULL);
      |CREATE TABLE "emp" ("id" bigserial PRIMARY KEY,
      |  "dept_id" bigint REFERENCES "dept"("id"), "email" text, "meta" jsonb);
      |CREATE TABLE "tag" ("a" bigint, "b" bigint, PRIMARY KEY ("a", "b"));""".stripMargin)

    val cat = PgIntrospect.introspect(psqlConnection())

    assert(Set("dept", "emp", "tag").subsetOf(cat.tables.keySet))
    // pk order preserved, composite pks included
    assert(cat.tables("tag").primaryKey == Seq("a", "b"))
    assert(cat.tables("emp").primaryKey == Seq("id"))
    // columns with live format_type and nullability
    val emp = cat.tables("emp").columns.map(c => c.name -> c).toMap
    assert(emp("dept_id").dataType == "bigint" && emp("dept_id").nullable)
    assert(emp("meta").dataType == "jsonb")
    val dept = cat.tables("dept").columns.map(c => c.name -> c).toMap
    assert(!dept("dname").nullable)
    // single-column FK edge, both endpoints resolved
    val e = cat.edges.find(_.childTable == "emp").get
    assert(e.childCol == "dept_id" && e.parentTable == "dept" && e.parentCol == "id")
  }

  test("staged merge live: CTAS staging + single-txn ON CONFLICT commit") {
    assume(up, "no live Postgres in this environment")
    psql("""CREATE TABLE "st" ("id" bigserial PRIMARY KEY, "name" text);
      |INSERT INTO "st"("name") VALUES ('a'), ('b');""".stripMargin)
    // the statement sequence writeStaged generates, in its order: CTAS
    // stage (no constraints), parallel-phase plain inserts, then the
    // whole-table commit bracket in ONE transaction
    psql("""CREATE TABLE "st__graft_stage" AS SELECT * FROM "st" WITH NO DATA""")
    psql("""INSERT INTO "st__graft_stage" ("id", "name")
      |  VALUES (1, 'dup'), (5, 'e'), (9, 'z')""".stripMargin)
    val merge = PostgresUpsert.mergeSql("st", "st__graft_stage",
      Seq("id", "name"), "id")
    val seq = psql(UpsertJdbcSink.sequenceNameSql("st", "id")).head.head
    psql(s"""BEGIN;
      |${UpsertJdbcSink.triggerSql("st", enable = false)};
      |$merge;
      |${UpsertJdbcSink.setvalSql(seq, "st", "id")};
      |${UpsertJdbcSink.triggerSql("st", enable = true)};
      |COMMIT;""".stripMargin)
    psql("""DROP TABLE "st__graft_stage"""")
    // conflict row skipped (id 1 keeps 'a'), new rows merged
    assert(psql("""SELECT "id", "name" FROM "st" ORDER BY "id"""")
      .map(r => (r(0), r(1))) ==
      Seq("1" -> "a", "2" -> "b", "5" -> "e", "9" -> "z"))
    // sequence repaired past max(pk) inside the same txn
    assert(psql(s"SELECT nextval('$seq')").head.head == "10")
  }
}
