package graft.io

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager}
import java.util.concurrent.CopyOnWriteArrayList

import graft.SparkSpec

/** Recording JDBC stub: every statement any connection executes lands in
  * one shared ordered log. This pins the DRIVER-SIDE STATEMENT SEQUENCE of
  * the Postgres upsert bracket — disable triggers → batched inserts (in
  * txn) → enable triggers → sequence repair — exactly the reference's
  * `BulkInsert` order (`/root/reference/dialect/postgres/postgres.go:
  * 64-97,483-523`), which no embedded engine can execute (Derby cannot
  * disable triggers and has no setval), so an ordering regression could
  * otherwise only be caught by a live Postgres.
  */
object RecordingJdbc {
  val log = new CopyOnWriteArrayList[String]()
  /** value pg_get_serial_sequence should report */
  @volatile var serialSequence: String = "user_id_seq"

  def reset(): Unit = log.clear()

  private def dflt(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case _ => null
  }

  private def proxy(ifaces: Array[Class[_]], h: (Method, Array[AnyRef]) => Option[AnyRef]): AnyRef =
    Proxy.newProxyInstance(getClass.getClassLoader, ifaces,
      new InvocationHandler {
        def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
          h(m, args).getOrElse(dflt(m.getReturnType))
      })

  /** single-row ResultSet: getString(1) == value (null allowed) */
  private def resultSet(value: String): java.sql.ResultSet = {
    var cursor = -1
    proxy(Array(classOf[java.sql.ResultSet]), (m, _) => m.getName match {
      case "next" => cursor += 1; Some(java.lang.Boolean.valueOf(cursor == 0))
      case "getString" | "getObject" => Some(value)
      case "getStatement" => Some(statement())
      case _ => None
    }).asInstanceOf[java.sql.ResultSet]
  }

  private def statement(): java.sql.Statement =
    proxy(Array(classOf[java.sql.Statement]), (m, args) => m.getName match {
      case "execute" =>
        log.add(s"execute: ${args(0)}"); Some(java.lang.Boolean.FALSE)
      case "executeQuery" =>
        val sql = args(0).toString
        log.add(s"query: $sql")
        Some(resultSet(if (sql.contains("pg_get_serial_sequence")) serialSequence else null))
      case _ => None
    }).asInstanceOf[java.sql.Statement]

  private def prepared(sql: String): java.sql.PreparedStatement = {
    var batched = 0
    proxy(Array(classOf[java.sql.PreparedStatement]), (m, _) => m.getName match {
      case "addBatch" => batched += 1; None
      case "executeBatch" =>
        log.add(s"executeBatch[$batched]")
        val r = Array.fill(batched)(1); batched = 0; Some(r)
      case _ => None
    }).asInstanceOf[java.sql.PreparedStatement]
  }

  def connection(): Connection =
    proxy(Array(classOf[Connection]), (m, args) => m.getName match {
      case "createStatement" => Some(statement())
      case "prepareStatement" =>
        log.add(s"prepare: ${args(0)}"); Some(prepared(args(0).toString))
      case "commit" => log.add("commit"); None
      case "rollback" => log.add("rollback"); None
      case _ => None
    }).asInstanceOf[Connection]
}

/** Registered for `jdbc:graftrec:` urls; both the driver-side bracket and
  * the per-partition executor connections flow through it (local mode =
  * one JVM, so the shared log sees everything in submission order for a
  * 1-partition DataFrame).
  */
class RecordingDriver extends Driver {
  def connect(url: String, info: java.util.Properties): Connection =
    if (acceptsURL(url)) RecordingJdbc.connection() else null
  def acceptsURL(url: String): Boolean = url.startsWith("jdbc:graftrec:")
  def getPropertyInfo(url: String, info: java.util.Properties) = Array.empty
  def getMajorVersion: Int = 1
  def getMinorVersion: Int = 0
  def jdbcCompliant(): Boolean = false
  def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
}

class PostgresUpsertSequenceSpec extends SparkSpec {
  import spark.implicits._

  DriverManager.registerDriver(new RecordingDriver)
  private val url = "jdbc:graftrec:mem"

  test("D1/D2 driver-side order: disable -> batched inserts -> enable -> setval (ref postgres.go:64-97)") {
    RecordingJdbc.reset()
    RecordingJdbc.serialSequence = "user_id_seq"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name").coalesce(1)
    UpsertJdbcSink.write(df, url, new java.util.Properties(), "user", "id",
      batchSize = 2, dialect = PostgresUpsert)

    val log = RecordingJdbc.log.toArray.map(_.toString).toSeq
    assert(log == Seq(
      """execute: ALTER TABLE "user" DISABLE TRIGGER ALL""",
      """prepare: INSERT INTO "user" ("id", "name") VALUES (?, ?) ON CONFLICT ("id") DO NOTHING""",
      "executeBatch[2]", // batchSize=2 flush mid-partition
      "executeBatch[1]", // tail flush
      "commit",
      """execute: ALTER TABLE "user" ENABLE TRIGGER ALL""",
      "query: SELECT pg_get_serial_sequence('user', 'id')",
      """execute: SELECT setval('user_id_seq', COALESCE((SELECT MAX("id") FROM "user") + 1, 1), false)"""))
  }

  test("no serial sequence -> enable still runs, setval skipped") {
    RecordingJdbc.reset()
    RecordingJdbc.serialSequence = null
    val df = Seq((1L, "a")).toDF("id", "name").coalesce(1)
    UpsertJdbcSink.write(df, url, new java.util.Properties(), "user", "id",
      dialect = PostgresUpsert)
    val log = RecordingJdbc.log.toArray.map(_.toString).toSeq
    assert(log.count(_.startsWith("execute: ALTER")) == 2)
    assert(!log.exists(_.contains("setval")))
  }
}
