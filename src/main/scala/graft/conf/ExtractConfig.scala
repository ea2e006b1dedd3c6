package graft.conf

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import com.fasterxml.jackson.annotation.JsonProperty

import graft.sanitize.ColumnRule

/** User-facing extraction config — same JSON shape as the reference's
  * `config.Config` (`/root/reference/config/config.go:11-52`):
  * per-table sanitize rules, reference-key allowlists, templated extra
  * queries, full-table extras, faker locale.
  *
  * Parsed with Jackson (already on Spark's classpath) — no new deps.
  */
final case class HttpDownload(@JsonProperty("base_url") baseUrl: String = "")

final case class Download(
    @JsonProperty("type") kind: String = "http",
    http: HttpDownload = HttpDownload())

final case class ColumnConf(
    name: String = "",
    fake: String = null,
    unique: Boolean = false,
    replace: String = null,
    sanitize: Boolean = false,
    download: Download = null) {
  def toRule: ColumnRule = ColumnRule(
    name = name,
    fake = Option(fake).filter(_.nonEmpty),
    unique = unique,
    replace = Option(replace),
    sanitize = sanitize)
}

/** A templated per-row query (`config.Query`, `config/config.go:11-15`) —
  * `{attr}` placeholders are filled from seed rows (ref J3).
  */
final case class QueryConf(
    @JsonProperty("table_name") tableName: String = "",
    query: String = "")

final case class SchemaConf(
    @JsonProperty("table_name") tableName: String = "",
    @JsonProperty("omit_reference_keys") omitReferenceKeys: Boolean = false,
    @JsonProperty("reference_keys") referenceKeys: Seq[String] = Nil,
    queries: Seq[QueryConf] = Nil,
    columns: Seq[ColumnConf] = Nil)

final case class ExtractConfig(
    locale: String = "en",
    schema: Seq[SchemaConf] = Nil,
    extra: Seq[SchemaConf] = Nil) {
  def schemaFor(table: String): Option[SchemaConf] =
    schema.find(_.tableName == table)
  /** Union of all allowlisted reference-key names (ref gating,
    * `/root/reference/etl/extractor.go:44-50`).
    */
  def rkAllowlist: Set[String] = schema.flatMap(_.referenceKeys).toSet
}

object ExtractConfig {
  private lazy val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }
  /** Parse + validate. The locale is checked HERE, not at sanitize time,
    * so an unsupported locale fails immediately with a config-attributed
    * message instead of aborting mid-extract (the reference accepts any
    * syreclabs locale; we ship a fixed pool set — see [[graft.sanitize.Faker]]).
    */
  def fromJson(json: String): ExtractConfig = {
    val c = mapper.readValue(json, classOf[ExtractConfig])
    require(graft.sanitize.Faker.supportedLocales.contains(c.locale),
      s"config: unsupported faker locale '${c.locale}' " +
        s"(supported: ${graft.sanitize.Faker.supportedLocales.toSeq.sorted.mkString(", ")})")
    c
  }
  def fromFile(path: String): ExtractConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
}
