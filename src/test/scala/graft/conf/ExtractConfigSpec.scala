package graft.conf

import org.scalatest.funsuite.AnyFunSuite

/** Parses the reference-shaped config fixture (FIXTURES.md §B, same JSON
  * shape as `/root/reference/config/config.go:11-52`).
  */
class ExtractConfigSpec extends AnyFunSuite {

  private val json =
    """{
      |  "locale": "fr",
      |  "schema": [{
      |    "table_name": "user",
      |    "reference_keys": ["comment_author_id_fkey"],
      |    "columns": [
      |      {"name": "name",     "replace": "{username}"},
      |      {"name": "email",    "replace": "ulule-{id}@ulule.com"},
      |      {"name": "password", "sanitize": true},
      |      {"name": "phone",    "fake": "phone_number", "unique": true},
      |      {"name": "avatar_path", "download": {"type": "http",
      |        "http": {"base_url": "file:///tmp/fixtures/media"}}}
      |    ],
      |    "queries": [{"table_name": "comment",
      |      "query": "SELECT * FROM comment WHERE author_id = {id}"}]
      |  }],
      |  "extra": [{"table_name": "region"}]
      |}""".stripMargin

  test("full reference-shaped config round-trips") {
    val c = ExtractConfig.fromJson(json)
    assert(c.locale == "fr")
    val u = c.schemaFor("user").get
    assert(u.referenceKeys == Seq("comment_author_id_fkey"))
    assert(c.rkAllowlist == Set("comment_author_id_fkey"))
    assert(u.columns.map(_.name) ==
      Seq("name", "email", "password", "phone", "avatar_path"))
    val rules = u.columns.map(_.toRule)
    assert(rules(0).replace.contains("{username}"))
    assert(rules(2).sanitize)
    assert(rules(3).fake.contains("phone_number") && rules(3).unique)
    assert(u.columns(4).download.http.baseUrl == "file:///tmp/fixtures/media")
    assert(u.queries.head.query.contains("{id}"))
    assert(c.extra.head.tableName == "region")
  }

  test("defaults: empty config") {
    val c = ExtractConfig.fromJson("{}")
    assert(c.locale == "en" && c.schema.isEmpty && c.extra.isEmpty)
  }

  test("unknown fields are tolerated") {
    val c = ExtractConfig.fromJson("""{"locale":"en","future_field":1}""")
    assert(c.locale == "en")
  }

  test("unsupported locale fails at parse time, attributed to the config") {
    val e = intercept[IllegalArgumentException] {
      ExtractConfig.fromJson("""{"locale":"ru"}""")
    }
    assert(e.getMessage.contains("config") &&
      e.getMessage.contains("'ru'") &&
      e.getMessage.contains("de, en, es, fr"))
  }
}
