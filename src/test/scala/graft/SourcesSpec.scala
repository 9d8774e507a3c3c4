package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{CovidSources, Tables}

/** S1/S2/S3/S4/S5 source & sink coverage on reference-shaped fixtures. */
class SourcesSpec extends SparkSpec {

  test("S1: OWID CSV reads through the declared schema") {
    val dir = Files.createTempDirectory("owid-csv").toString
    // columns in owidSchema order (csv schema matches by position)
    val header = "iso_code,country,date,total_cases,new_cases,total_deaths," +
      "new_deaths,total_tests,positive_rate,tests_per_case,people_vaccinated," +
      "people_fully_vaccinated,total_vaccinations,population,new_tests"
    val rows = Seq(
      "USA,United States,2024-01-01,1000,10,50,1,,,,,,,40000000,200",
      "AFG,Afghanistan,2024-01-01,500,,25,,,,,,,,40000000,")
    Files.write(java.nio.file.Paths.get(dir, "owid.csv"),
      (header +: rows).mkString("\n").getBytes)
    val df = CovidSources.readOwidCsv(spark, dir)
    assert(df.count() == 2)
    val usa = df.filter(col("iso_code") === "USA").collect()(0)
    assert(usa.getAs[Double]("total_cases") == 1000.0)
    assert(usa.getAs[java.sql.Date]("date") == java.sql.Date.valueOf("2024-01-01"))
    // NULLs survive as SQL NULLs, not zeros
    val afg = df.filter(col("iso_code") === "AFG").collect()(0)
    assert(afg.isNullAt(afg.fieldIndex("new_cases")))
  }

  test("S2+S3+S4: disease.sh JSON array flattens with epoch-ms conversion") {
    val dir = Files.createTempDirectory("api-json").toString
    val json =
      """[{"country":"USA","countryInfo":{"_id":840,"iso2":"US","iso3":"USA",
        |"lat":38.0,"long":-97.0,"flag":"https://x/us.png"},
        |"population":331000000,"cases":1200,"deaths":60,"recovered":100,
        |"active":40,"critical":5,"casesPerOneMillion":3.6,
        |"deathsPerOneMillion":0.2,"tests":5000,"testsPerOneMillion":15.1,
        |"todayCases":3,"todayDeaths":0,"todayRecovered":1,
        |"updated":1704153600000}]""".stripMargin.replace("\n", "")
    Files.write(java.nio.file.Paths.get(dir, "api.json"), json.getBytes)
    val flat = CovidSources.flattenDiseaseSh(
      CovidSources.readDiseaseShJson(spark, dir))
    val r = flat.collect()(0)
    assert(r.getAs[String]("iso_code") == "USA")
    assert(r.getAs[Long]("country_id") == 840L)
    assert(r.getAs[Double]("longitude") == -97.0)
    assert(r.getAs[Long]("current_cases") == 1200L)
    // 1704153600000 ms = 2024-01-02 00:00:00 UTC
    assert(r.getAs[java.sql.Timestamp]("last_updated") ==
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
  }

  test("S5: CSV export sink round-trips") {
    val out = Files.createTempDirectory("csv-out").toString + "/export"
    val df = Tables.nation(spark, sf0001)
      .select("n_nationkey", "n_name").orderBy("n_nationkey")
    Tables.exportCsv(df, out)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() == df.count())
    assert(back.columns.toSeq == Seq("n_nationkey", "n_name"))
  }
}
