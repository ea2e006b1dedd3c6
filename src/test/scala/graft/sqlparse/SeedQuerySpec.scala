package graft.sqlparse

import graft.SparkSpec

/** Ports `/root/reference/etl/util_test.go:9-13` (seed-query table regex)
  * and covers the parser-based fallback + template substitution.
  */
class SeedQuerySpec extends SparkSpec {

  test("driving table: lowercase (ref util_test.go:10)") {
    assert(SeedQuery.drivingTable("select * from ulule_project") == Some("ulule_project"))
  }

  test("driving table: uppercase (ref util_test.go:11)") {
    assert(SeedQuery.drivingTable("SELECT * FROM ulule_project") == Some("ulule_project"))
  }

  test("driving table: column list (ref util_test.go:12)") {
    assert(SeedQuery.drivingTable("SELECT one, two, three FROM ulule_project") == Some("ulule_project"))
  }

  test("driving table: with predicate") {
    assert(SeedQuery.drivingTable("SELECT * FROM customer WHERE c_custkey <= 10") == Some("customer"))
  }

  test("non-SELECT yields None") {
    assert(SeedQuery.drivingTable("DELETE FROM t").isEmpty)
  }

  test("parser fallback finds all relations") {
    val rels = SeedQuery.relations(spark,
      "SELECT * FROM a JOIN b ON a.x = b.x WHERE a.y IN (SELECT y FROM c)")
    assert(rels.toSet == Set("a", "b", "c"))
  }

  test("template substitution (ref sanitizer.go:110-124 semantics)") {
    assert(SeedQuery.substitute("SELECT * FROM comment WHERE author_id = {id}",
      Map("id" -> 7L)) == "SELECT * FROM comment WHERE author_id = 7")
    // unknown attrs stay verbatim, as in the reference
    assert(SeedQuery.substitute("x = {nope}", Map("id" -> 1)) == "x = {nope}")
  }
}
