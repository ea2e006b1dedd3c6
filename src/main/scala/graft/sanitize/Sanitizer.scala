package graft.sanitize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII sanitization — Spark-native re-expression of the reference's
  * sanitizer (`/root/reference/etl/sanitizer.go`).
  *
  * Rule shapes mirror `config.Column` (`/root/reference/config/config.go:30-37`):
  *   - `replace`: a `{attr}` template rewritten from the current row
  *     (`replaceVar`, `etl/sanitizer.go:110-124`) — compiled here to a
  *     `concat` of literal segments and column refs (whole-stage codegen,
  *     no UDF);
  *   - `sanitize`: null-out (`etl/sanitizer.go:102-103`);
  *   - `fake`: a faker-generated value (`fakeValue`, `etl/sanitizer.go:66-93`).
  *     The reference draws random values and retries on collision
  *     (`:80-90`); a distributed seen-set is the wrong tool at scale, so
  *     our fakes are DETERMINISTIC — seeded by an md5-derived index
  *     (`conv(substr(md5(salt:pk), 1, 15), 16, 10) % poolSize`, the same
  *     cross-engine hash bridge the dedup tier uses, so even the DuckDB
  *     oracle replays fakes bit-for-bit) into broadcast-literal locale
  *     arrays — and `unique` is achieved by construction (pk suffix),
  *     verifiable with a groupBy-count.
  *
  * All rules compile to Catalyst `Column` expressions: the whole sanitize
  * pass is one narrow projection — no shuffle, no UDF, codegen'd.
  */
final case class ColumnRule(
    name: String,
    fake: Option[String] = None,
    unique: Boolean = false,
    replace: Option[String] = None,
    sanitize: Boolean = false)

object Sanitizer {

  /** `{attr}` template placeholders, same regex as the reference
    * (`attrReg`, `etl/sanitizer.go:15`).
    */
  private val AttrRe = raw"\{(\w+)\}".r

  /** Compile a `{attr}` template into a concat expression over the row. */
  def template(tmpl: String): Column = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- AttrRe.findAllMatchIn(tmpl)) {
      if (m.start > last) parts += lit(tmpl.substring(last, m.start))
      parts += col(m.group(1)).cast("string")
      last = m.end
    }
    if (last < tmpl.length) parts += lit(tmpl.substring(last))
    if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** md5-derived deterministic seed — first 15 hex chars → 60-bit
    * non-negative bigint, the same cross-engine bridge the dedup tier
    * uses, so DuckDB replays every fake exactly (see
    * [[graft.queries.SanitizeQueries.fakeCustomerSql]]).
    */
  private def seed(pk: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), pk.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  /** Deterministic fake value for `kind`, seeded by the row's pk.
    * Locale tables are literal arrays (broadcast with the plan); lookup is
    * `element_at(table, seed(pk, salt) % n + 1)` — pure codegen.
    */
  def fake(kind: String, pk: Column, unique: Boolean, locale: String = "fr"): Column = {
    val tables = Faker.tables(locale)
    def pick(pool: Seq[String], salt: String): Column = {
      val arr = array(pool.map(lit): _*)
      element_at(arr, (pmod(seed(pk, salt), lit(pool.size)) + 1).cast("int"))
    }
    val base = kind match {
      case "first_name" => pick(tables.firstNames, "first_name")
      case "last_name"  => pick(tables.lastNames, "last_name")
      case "name" => concat(pick(tables.firstNames, "first_name"), lit(" "),
        pick(tables.lastNames, "last_name"))
      case "email" => concat(lower(pick(tables.firstNames, "email_l")), lit("."),
        lower(pick(tables.lastNames, "email_r")),
        lit("@"), pick(tables.emailDomains, "email_d"))
      case "street_address" => concat(
        (pmod(seed(pk, "street_no"), lit(199)) + 1).cast("string"),
        lit(" "), pick(tables.streetTypes, "street_t"), lit(" "),
        pick(tables.streetNames, "street_n"))
      case "phone_number" => concat(lit(tables.phonePrefix),
        lpad(pmod(seed(pk, "phone"), lit(100000000L)).cast("string"), 8, "0"))
      case other => sys.error(s"unknown fake kind: $other")
    }
    if (unique) {
      // injective in pk ⇒ unique by construction (replaces the reference's
      // random-retry loop, etl/sanitizer.go:80-90)
      kind match {
        case "email" => regexp_replace(base, lit("@"), concat(lit("."), pk.cast("string"), lit("@")))
        case _       => concat(base, lit("-"), pk.cast("string"))
      }
    } else base
  }

  /** Apply the rules to a DataFrame; `pkCol` seeds deterministic fakes.
    * Output column names and types are identical to the input; nullability
    * may tighten (generated values are never null), which is safe for all
    * downstream writers.
    */
  def apply(df: DataFrame, rules: Seq[ColumnRule], pkCol: String,
      locale: String = "fr"): DataFrame = {
    val byName = rules.map(r => r.name -> r).toMap
    val cols = df.schema.fields.map { f =>
      byName.get(f.name) match {
        case Some(r) if r.sanitize => lit(null).cast(f.dataType).as(f.name)
        case Some(r) if r.replace.isDefined => template(r.replace.get).as(f.name)
        case Some(r) if r.fake.isDefined =>
          fake(r.fake.get, col(pkCol), r.unique, locale).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}

/** Tiny public-knowledge locale pools (common names lists); enough to
  * honor the reference's locale surface (`fr` supported,
  * `etl/sanitizer.go:22-30`) with deterministic output.
  */
object Faker {
  final case class Locale(
      firstNames: Seq[String], lastNames: Seq[String],
      emailDomains: Seq[String], streetNames: Seq[String],
      streetTypes: Seq[String], phonePrefix: String)

  private val fr = Locale(
    firstNames = Seq("Jean", "Marie", "Pierre", "Sophie", "Luc", "Claire",
      "Paul", "Camille", "Louis", "Julie", "Hugo", "Emma", "Léa", "Nathan",
      "Chloé", "Lucas", "Manon", "Jules", "Alice", "Théo"),
    lastNames = Seq("Martin", "Bernard", "Dubois", "Thomas", "Robert",
      "Richard", "Petit", "Durand", "Leroy", "Moreau", "Simon", "Laurent",
      "Lefebvre", "Michel", "Garcia", "David", "Bertrand", "Roux",
      "Vincent", "Fournier"),
    emailDomains = Seq("example.fr", "exemple.fr", "courriel.fr", "mail.fr"),
    streetNames = Seq("de la République", "Victor Hugo", "de la Paix",
      "des Lilas", "Jean Jaurès", "du Général de Gaulle", "Pasteur",
      "des Écoles", "de l'Église", "du Moulin"),
    streetTypes = Seq("rue", "avenue", "boulevard", "place", "impasse"),
    phonePrefix = "+3361")

  private val es = Locale(
    firstNames = Seq("José", "María", "Antonio", "Carmen", "Manuel", "Ana",
      "Francisco", "Isabel", "Juan", "Laura", "Carlos", "Marta", "Javier",
      "Lucía", "Miguel", "Elena", "Pablo", "Sara", "Diego", "Paula"),
    lastNames = Seq("García", "Martínez", "López", "Sánchez", "González",
      "Rodríguez", "Fernández", "Pérez", "Gómez", "Martín", "Jiménez",
      "Ruiz", "Hernández", "Díaz", "Moreno", "Álvarez", "Romero", "Alonso",
      "Gutiérrez", "Navarro"),
    emailDomains = Seq("ejemplo.es", "correo.es", "example.es"),
    streetNames = Seq("Mayor", "de la Constitución", "Gran Vía", "del Sol",
      "de Cervantes", "de Goya", "Real", "de la Iglesia", "del Carmen",
      "de América"),
    streetTypes = Seq("calle", "avenida", "plaza", "paseo", "camino"),
    phonePrefix = "+3466")

  private val de = Locale(
    firstNames = Seq("Hans", "Anna", "Peter", "Ursula", "Klaus", "Monika",
      "Wolfgang", "Petra", "Jürgen", "Sabine", "Thomas", "Karin", "Michael",
      "Susanne", "Andreas", "Claudia", "Stefan", "Julia", "Markus", "Laura"),
    lastNames = Seq("Müller", "Schmidt", "Schneider", "Fischer", "Weber",
      "Meyer", "Wagner", "Becker", "Schulz", "Hoffmann", "Schäfer", "Koch",
      "Bauer", "Richter", "Klein", "Wolf", "Schröder", "Neumann", "Schwarz",
      "Zimmermann"),
    emailDomains = Seq("beispiel.de", "example.de", "mail.de"),
    streetNames = Seq("Goethe", "Schiller", "Mozart", "Beethoven", "Lessing",
      "Kant", "Humboldt", "Linden", "Rosen", "Dürer"),
    streetTypes = Seq("Straße", "Weg", "Allee", "Platz", "Gasse"),
    phonePrefix = "+4915")

  private val en = fr.copy(
    firstNames = Seq("James", "Mary", "John", "Patricia", "Robert",
      "Jennifer", "Michael", "Linda", "William", "Elizabeth", "David",
      "Barbara", "Richard", "Susan", "Joseph", "Jessica", "Thomas",
      "Sarah", "Charles", "Karen"),
    lastNames = Seq("Smith", "Johnson", "Williams", "Brown", "Jones",
      "Garcia", "Miller", "Davis", "Rodriguez", "Martinez", "Hernandez",
      "Lopez", "Gonzalez", "Wilson", "Anderson", "Taylor", "Moore",
      "Jackson", "Martin", "Lee"),
    emailDomains = Seq("example.com", "example.org", "example.net"),
    streetNames = Seq("Main", "Oak", "Maple", "Cedar", "Elm", "Washington",
      "Lake", "Hill", "Park", "Pine"),
    streetTypes = Seq("St", "Ave", "Blvd", "Dr", "Ln"),
    phonePrefix = "+1555")

  // single source of truth for the locale surface: the supported set and
  // both error messages derive from this map, so adding a pool can never
  // leave the parse-time validation or the error text stale
  private val byName: Map[String, Locale] =
    Map("fr" -> fr, "en" -> en, "es" -> es, "de" -> de)

  /** The locales we ship pools for; [[graft.conf.ExtractConfig.fromJson]]
    * validates against this set at parse time so bad configs fail fast.
    */
  val supportedLocales: Set[String] = byName.keySet

  /** The reference accepts any syreclabs locale string from config
    * (`/root/reference/etl/sanitizer.go:22-30`); we ship a fixed pool set
    * and FAIL LOUDLY on anything else — a silent en fallback would ship
    * wrong-locale fakes into an export nobody re-reads.
    */
  def tables(locale: String): Locale =
    byName.getOrElse(locale, throw new IllegalArgumentException(
      s"unknown faker locale '$locale' " +
        s"(supported: ${supportedLocales.toSeq.sorted.mkString(", ")})"))
}
