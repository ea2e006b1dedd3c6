package graft.io

import java.sql.DriverManager
import org.apache.spark.sql.DataFrame
import graft.SparkSpec
import graft.engine.Engine
import graft.conf.ExtractConfig

/** Introspects a LIVE database (embedded Derby) into a Catalog, then
  * runs the full engine extract over JDBC reads — the reference's actual
  * deployment shape (introspect pg_catalog at startup, extract from the
  * live DB; `/root/reference/etl/engine.go:67-86,104-134`) executed end
  * to end rather than spec'd on SQL text.
  */
class JdbcIntrospectSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:metadb;create=true"

  private def setup(): Unit = {
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("""CREATE TABLE "usr" (
      | "id" BIGINT PRIMARY KEY, "username" VARCHAR(32), "email" VARCHAR(64))""".stripMargin)
    st.execute("""CREATE TABLE "project" (
      | "id" BIGINT PRIMARY KEY, "owner_id" BIGINT, "title" VARCHAR(64),
      | CONSTRAINT "project_owner_fkey" FOREIGN KEY ("owner_id") REFERENCES "usr" ("id"))""".stripMargin)
    st.execute("""CREATE TABLE "comment" (
      | "id" BIGINT PRIMARY KEY, "project_id" BIGINT, "author_id" BIGINT,
      | CONSTRAINT "comment_project_fkey" FOREIGN KEY ("project_id") REFERENCES "project" ("id"),
      | CONSTRAINT "comment_author_fkey" FOREIGN KEY ("author_id") REFERENCES "usr" ("id"))""".stripMargin)
    // composite-keyed table with a composite FK: the PK must introspect
    // whole; the multi-column FK must be DROPPED whole (single-col FKs
    // only, like the reference)
    st.execute("""CREATE TABLE "tag" (
      | "a" BIGINT, "b" BIGINT, "label" VARCHAR(16), PRIMARY KEY ("a", "b"))""".stripMargin)
    st.execute("""CREATE TABLE "tagref" (
      | "id" BIGINT PRIMARY KEY, "a" BIGINT, "b" BIGINT,
      | CONSTRAINT "tagref_tag_fkey" FOREIGN KEY ("a", "b") REFERENCES "tag" ("a", "b"))""".stripMargin)

    st.execute("""INSERT INTO "usr" VALUES (1, 'alice', 'a@x'), (2, 'bob', 'b@x'), (3, 'carol', 'c@x')""")
    st.execute("""INSERT INTO "project" VALUES (10, 1, 'p-alice'), (20, 2, 'p-bob')""")
    st.execute("""INSERT INTO "comment" VALUES (100, 10, 2), (101, 20, 1), (102, 20, 3)""")
    c.close()
  }

  private lazy val catalog = {
    setup()
    val c = DriverManager.getConnection(url)
    try JdbcIntrospect.introspect(c, "APP") finally c.close()
  }

  test("tables, composite PKs, columns introspect from live metadata") {
    assert(catalog.tables.keySet == Set("usr", "project", "comment", "tag", "tagref"))
    assert(catalog.tables("usr").primaryKey == Seq("id"))
    assert(catalog.tables("tag").primaryKey == Seq("a", "b"))
    assert(catalog.tables("usr").columns.map(_.name) == Seq("id", "username", "email"))
    assert(catalog.tables("usr").columns.head.nullable == false)
  }

  test("FK edges come from getImportedKeys; composite FKs dropped whole") {
    assert(catalog.foreignKeysOf("comment").map(_.name).sorted ==
      Seq("comment_author_fkey", "comment_project_fkey"))
    assert(catalog.referenceKeysOf("usr").map(_.childTable).sorted ==
      Seq("comment", "project"))
    // the 2-column tagref FK must not appear (not truncated to "a")
    assert(catalog.foreignKeysOf("tagref").isEmpty)
  }

  test("engine extract runs the closure over live JDBC reads") {
    val props = new java.util.Properties
    val loadTable: String => DataFrame =
      t => spark.read.jdbc(url, s""""$t"""", props)
    val engine = new Engine(spark, catalog, loadTable, ExtractConfig())
    val out = engine.extractFrom("usr",
      loadTable("usr").filter(org.apache.spark.sql.functions.col("id") === 1L))
    // alice -> project 10 (RK) -> comment 100 (RK) -> author bob (FK)
    // -> project 20 (bob's, via RK on bob? no: RKs only at depth 0)
    assert(out.keySet.contains("project") && out.keySet.contains("comment"))
    assert(out("usr").collect().map(_.getLong(0)).toSet.contains(2L))
    assert(out("project").collect().map(_.getLong(0)).toSet.contains(10L))
  }
}
