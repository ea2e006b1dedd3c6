package graft.sanitize

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Ports the reference's sanitizer unit test
  * (`/root/reference/etl/sanitizer_test.go:10-47`, cases restated in
  * /root/repo/FIXTURES.md §B) and adds the determinism/uniqueness
  * properties that replace the reference's random-retry loop.
  */
class SanitizerSpec extends SparkSpec {
  import spark.implicits._

  private def users = Seq(
    (1L, "jdoe", "John Doe", "john@real.com", "hunter2", "0600000001"),
    (2L, "asmith", "Alice Smith", "alice@real.com", "secret", "0600000002"),
    (3L, "bmartin", "Bob Martin", "bob@real.com", "pa55", "0600000003")
  ).toDF("id", "username", "name", "email", "password", "phone")

  private val rules = Seq(
    ColumnRule("name", replace = Some("{username}")),
    ColumnRule("email", replace = Some("ulule-{id}@ulule.com")),
    ColumnRule("password", sanitize = true),
    ColumnRule("phone", fake = Some("phone_number"), unique = true))

  test("replace template: email -> ulule-{id}@ulule.com (ref sanitizer_test.go:44)") {
    val out = Sanitizer(users, rules, "id").orderBy("id").collect()
    assert(out(0).getAs[String]("email") == "ulule-1@ulule.com")
    assert(out(1).getAs[String]("email") == "ulule-2@ulule.com")
  }

  test("replace template: name -> {username} (ref sanitizer_test.go:46)") {
    val out = Sanitizer(users, rules, "id").orderBy("id").collect()
    assert(out(0).getAs[String]("name") == "jdoe")
    assert(out(2).getAs[String]("name") == "bmartin")
  }

  test("sanitize: password nulled out (ref sanitizer_test.go:45)") {
    val out = Sanitizer(users, rules, "id").collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("password"))))
  }

  test("column names and types are preserved by sanitization") {
    val out = Sanitizer(users, rules, "id").schema
    assert(out.fields.map(f => (f.name, f.dataType)).toSeq ==
      users.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("fakes are deterministic across runs") {
    val a = Sanitizer(users, rules, "id").orderBy("id").collect().map(_.toSeq)
    val b = Sanitizer(users, rules, "id").orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq.map(_.toList) == b.toSeq.map(_.toList))
  }

  test("unique fakes have no collisions (uniqueness by construction)") {
    val df = Sanitizer(users, rules, "id")
    val dup = df.groupBy("phone").count().filter(col("count") > 1).count()
    assert(dup == 0L)
    // larger pool than the locale tables, to force base-value collisions
    val many = spark.range(1, 500).toDF("id")
      .withColumn("email", lit("x"))
    val fakes = Sanitizer(many, Seq(ColumnRule("email", fake = Some("email"), unique = true)), "id")
    assert(fakes.select("email").distinct().count() == 499L)
  }

  test("fake kinds produce plausible shapes (fr locale)") {
    val df = Sanitizer(users.withColumn("addr", lit("x")),
      Seq(ColumnRule("addr", fake = Some("street_address")),
          ColumnRule("name", fake = Some("name")),
          ColumnRule("email", fake = Some("email"))), "id", locale = "fr")
    val r = df.orderBy("id").collect()(0)
    assert(r.getAs[String]("addr").matches(raw"\d+ (rue|avenue|boulevard|place|impasse) .+"))
    assert(r.getAs[String]("name").split(" ").length >= 2)
    assert(r.getAs[String]("email").contains("@"))
  }

  test("es/de locales draw from their own pools; unknown locale fails loudly") {
    val es = Sanitizer(users, Seq(ColumnRule("name", fake = Some("first_name"))),
      "id", locale = "es").select("name").collect().map(_.getString(0))
    assert(es.forall(Faker.tables("es").firstNames.contains))
    val de = Sanitizer(users, Seq(ColumnRule("name", fake = Some("last_name"))),
      "id", locale = "de").select("name").collect().map(_.getString(0))
    assert(de.forall(Faker.tables("de").lastNames.contains))
    // the reference takes any syreclabs locale from config; we refuse
    // rather than silently anglicize (ref etl/sanitizer.go:22-30)
    val e = intercept[IllegalArgumentException](Faker.tables("xx"))
    assert(e.getMessage.contains("unknown faker locale"))
  }

  test("template compiler handles literal-only and multi-attr templates") {
    val df = users.select(col("id"), col("username"),
      Sanitizer.template("static").as("s"),
      Sanitizer.template("{username}-{id}!").as("m"))
    val r = df.orderBy("id").collect()(0)
    assert(r.getAs[String]("s") == "static")
    assert(r.getAs[String]("m") == "jdoe-1!")
  }
}
