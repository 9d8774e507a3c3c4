package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X1/J4 — dictionary map with identity fallback (reference
  * `standardize_country_names`, data_cleaner.py:41-51; the 25-entry map
  * at config/constants.py:14-41).
  *
  * Implemented as a **broadcast left join + coalesce** — the idiomatic
  * scale-safe form: the mapping side is a bounded constant table
  * (broadcast), the fact side streams through untouched; unmapped keys
  * fall back to their original value exactly like the pandas
  * `.map(...).fillna(original)`.
  */
object Standardize {

  def standardize(
      df: DataFrame,
      keyCol: String,
      mapping: Map[String, String],
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mapDf = mapping.toSeq.toDF("__map_key", "__map_value")
    df.join(broadcast(mapDf), df(keyCol) === col("__map_key"), "left")
      .withColumn(outCol, coalesce(col("__map_value"), col(keyCol)))
      .drop("__map_key", "__map_value")
  }

  /** The reference's OWID→API country rename rules
    * (config/constants.py:14-41). */
  val CountryNameMapping: Map[String, String] = Map(
    "United States" -> "USA",
    "United Kingdom" -> "UK",
    "South Korea" -> "S. Korea",
    "Democratic Republic of Congo" -> "DRC",
    "Congo" -> "Congo",
    "Czechia" -> "Czechia",
    "United Arab Emirates" -> "UAE",
    "Central African Republic" -> "Central African Republic",
    "Bosnia and Herzegovina" -> "Bosnia",
    "North Macedonia" -> "Macedonia",
    "Cote d'Ivoire" -> "Ivory Coast",
    "Curacao" -> "Curaçao",
    "Faeroe Islands" -> "Faroe Islands",
    "Falkland Islands" -> "Falkland Islands (Malvinas)",
    "Micronesia (country)" -> "Micronesia",
    "Saint Kitts and Nevis" -> "Saint Kitts and Nevis",
    "Saint Vincent and the Grenadines" -> "Saint Vincent and the Grenadines",
    "Sao Tome and Principe" -> "São Tomé and Príncipe",
    "Sint Maarten (Dutch part)" -> "Sint Maarten",
    "Timor" -> "Timor-Leste",
    "Turks and Caicos Islands" -> "Turks and Caicos Islands",
    "Vatican" -> "Holy See (Vatican City State)",
    "Wallis and Futuna" -> "Wallis and Futuna",
    "Myanmar" -> "Burma",
    "Cape Verde" -> "Cabo Verde"
  )

  /** The reference's non-country exclusion list
    * (config/constants.py:44-61). */
  val ExcludeRegions: Seq[String] = Seq(
    "World", "Africa", "Asia", "Europe", "European Union", "North America",
    "Oceania", "South America", "International", "High income", "Low income",
    "Lower middle income", "Upper middle income", "England", "Scotland",
    "Wales"
  )

  /** OWID aggregate pseudo-ISO codes (data_loader.py:114-116). */
  val ExcludeIsoCodes: Seq[String] =
    Seq("OWID_WRL", "OWID_HIC", "OWID_LIC", "OWID_LMC", "OWID_UMC")

  /** F3 regex (data_cleaner.py:73-77). */
  val ExcludePattern: String = "(?i)(income|OECD|Union|International)"
}
