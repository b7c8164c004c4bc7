package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bundled country-name → ISO-3166 alpha-2 dimension — the engine-side
  * replacement for the reference's `countrycode` R package
  * (`Coalplants_GEM.R:200-201`, SURVEY.md §2.9 X12). Public-knowledge
  * ISO data, embedded so no external file is needed; the Kosovo "XK"
  * patch stays in [[graft.ops.GemPipeline.countryToIso2]] exactly like
  * the reference keeps it outside `countrycode`.
  *
  * Both spellings families are included: plain English short names and
  * common GEM variants (e.g. "United States" and "USA"), plus ISO-3166
  * alpha-3 aliases so the Climate-Trace iso3→iso2 hop
  * (`TotalData_GEM.R:108-110`) is the same lookup.
  */
object CountryDim {

  /** (name-or-alias, iso2). */
  val entries: Seq[(String, String)] = Seq(
    "Afghanistan" -> "AF", "Albania" -> "AL", "Algeria" -> "DZ",
    "Angola" -> "AO", "Argentina" -> "AR", "Armenia" -> "AM",
    "Australia" -> "AU", "Austria" -> "AT", "Azerbaijan" -> "AZ",
    "Bangladesh" -> "BD", "Belarus" -> "BY", "Belgium" -> "BE",
    "Bolivia" -> "BO", "Bosnia and Herzegovina" -> "BA", "Botswana" -> "BW",
    "Brazil" -> "BR", "Bulgaria" -> "BG", "Cambodia" -> "KH",
    "Cameroon" -> "CM", "Canada" -> "CA", "Chile" -> "CL",
    "China" -> "CN", "Colombia" -> "CO", "Costa Rica" -> "CR",
    "Croatia" -> "HR", "Cuba" -> "CU", "Czech Republic" -> "CZ",
    "Democratic Republic of the Congo" -> "CD", "Denmark" -> "DK",
    "Dominican Republic" -> "DO", "Ecuador" -> "EC", "Egypt" -> "EG",
    "El Salvador" -> "SV", "Estonia" -> "EE", "Ethiopia" -> "ET",
    "Finland" -> "FI", "France" -> "FR", "Georgia" -> "GE",
    "Germany" -> "DE", "Ghana" -> "GH", "Greece" -> "GR",
    "Guatemala" -> "GT", "Honduras" -> "HN", "Hungary" -> "HU",
    "Iceland" -> "IS", "India" -> "IN", "Indonesia" -> "ID",
    "Iran" -> "IR", "Iraq" -> "IQ", "Ireland" -> "IE",
    "Israel" -> "IL", "Italy" -> "IT", "Japan" -> "JP",
    "Jordan" -> "JO", "Kazakhstan" -> "KZ", "Kenya" -> "KE",
    "Kosovo" -> "XK", "Kuwait" -> "KW", "Kyrgyzstan" -> "KG",
    "Laos" -> "LA", "Latvia" -> "LV", "Lebanon" -> "LB",
    "Libya" -> "LY", "Lithuania" -> "LT", "Malaysia" -> "MY",
    "Mexico" -> "MX", "Mongolia" -> "MN", "Morocco" -> "MA",
    "Mozambique" -> "MZ", "Myanmar" -> "MM", "Nepal" -> "NP",
    "Netherlands" -> "NL", "New Zealand" -> "NZ", "Nicaragua" -> "NI",
    "Nigeria" -> "NG", "North Korea" -> "KP", "North Macedonia" -> "MK",
    "Norway" -> "NO", "Oman" -> "OM", "Pakistan" -> "PK",
    "Panama" -> "PA", "Paraguay" -> "PY", "Peru" -> "PE",
    "Philippines" -> "PH", "Poland" -> "PL", "Portugal" -> "PT",
    "Qatar" -> "QA", "Romania" -> "RO", "Russia" -> "RU",
    "Saudi Arabia" -> "SA", "Senegal" -> "SN", "Serbia" -> "RS",
    "Singapore" -> "SG", "Slovakia" -> "SK", "Slovenia" -> "SI",
    "South Africa" -> "ZA", "South Korea" -> "KR", "Spain" -> "ES",
    "Sri Lanka" -> "LK", "Sudan" -> "SD", "Sweden" -> "SE",
    "Switzerland" -> "CH", "Syria" -> "SY", "Taiwan" -> "TW",
    "Tajikistan" -> "TJ", "Tanzania" -> "TZ", "Thailand" -> "TH",
    "Tunisia" -> "TN", "Turkey" -> "TR", "Turkmenistan" -> "TM",
    "Uganda" -> "UG", "Ukraine" -> "UA", "United Arab Emirates" -> "AE",
    "United Kingdom" -> "GB", "United States" -> "US", "Uruguay" -> "UY",
    "Uzbekistan" -> "UZ", "Venezuela" -> "VE", "Vietnam" -> "VN",
    "Yemen" -> "YE", "Zambia" -> "ZM", "Zimbabwe" -> "ZW",
    // Common GEM spelling variants
    "USA" -> "US", "UK" -> "GB", "DR Congo" -> "CD", "Czechia" -> "CZ",
    "South Korea (Republic of Korea)" -> "KR", "Türkiye" -> "TR",
    // ISO-3166 alpha-3 aliases (Climate-Trace iso3 → iso2 hop); "USA"
    // is already present via the spelling variants above.
    "CHN" -> "CN", "IND" -> "IN", "DEU" -> "DE",
    "FRA" -> "FR", "GBR" -> "GB", "JPN" -> "JP", "BRA" -> "BR",
    "RUS" -> "RU", "AUS" -> "AU", "CAN" -> "CA", "ZAF" -> "ZA",
    "IDN" -> "ID", "MEX" -> "MX", "TUR" -> "TR", "POL" -> "PL",
    "ESP" -> "ES", "ITA" -> "IT", "NLD" -> "NL", "KOR" -> "KR",
    "VNM" -> "VN", "SAU" -> "SA", "ARG" -> "AR", "EGY" -> "EG")

  /** The dimension as a DataFrame (country_name, iso2) — broadcast-scale
    * by construction (a few hundred rows, forever).
    */
  def dim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    entries.toDF("country_name", "iso2")
  }

  /** DuckDB VALUES fragment of the same entries, kept adjacent so the
    * oracle can never drift from the Spark side.
    */
  def duckValuesSql: String =
    entries.map { case (n, c) => s"('${n.replace("'", "''")}', '$c')" }
      .mkString("(VALUES ", ", ", ") AS cd(country_name, iso2)")
}
