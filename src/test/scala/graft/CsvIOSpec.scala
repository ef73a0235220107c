package graft

import graft.pipeline.Schema
import graft.sources.CsvTables
import org.apache.spark.sql.functions._

/** CSV edge round-trip (S2/S5/S6): write canonical frames as daily CSVs,
  * read them back through a multi-path schema'd scan, verify values and
  * null round-tripping.
  */
class CsvIOSpec extends SparkSpec {
  import spark.implicits._

  test("canonical CSV round-trip across multiple daily files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val day1 = Seq(
      ("acme", "engineer", "Full-Time", "seattle, wa", "United States",
       Some(120000.0), "2025-10-20 09:15:00", "indeed", "python, sql",
       "communication", "Kaggle"),
      ("beta", "analyst", "Contract", "nyc", "United States",
       None, "2025-10-20 10:00:00", "indeed", "excel", "teamwork", "Kaggle"))
    val day2 = Seq(
      ("gamma", "scientist", "Full-Time", "remote", "United States",
       Some(150000.0), "2025-10-21 11:30:00", "zip recruiter", "spark",
       "leadership", "HuggingFace"))
    def toDf(rows: Seq[(String, String, String, String, String, Option[Double],
                        String, String, String, String, String)]) =
      rows.toDF(Schema.canonical.fields.map(_.name): _*)
    CsvTables.write(toDf(day1), s"$tmp/fetch_jobs_2025-10-20.csv")
    CsvTables.write(toDf(day2), s"$tmp/fetch_jobs_2025-10-21.csv")

    // S5: one multi-path scan unions both daily files
    val back = CsvTables.read(spark, Schema.canonical,
      s"$tmp/fetch_jobs_2025-10-20.csv", s"$tmp/fetch_jobs_2025-10-21.csv")
    assert(back.count() == 3)
    assert(back.schema == Schema.canonical)
    val beta = back.where(col("company_name") === "beta").collect()(0)
    assert(beta.isNullAt(beta.fieldIndex("salary"))) // null round-trips
    val gamma = back.where(col("company_name") === "gamma").collect()(0)
    assert(gamma.getAs[Double]("salary") == 150000.0)

    // glob variant of the same union scan
    val globbed = CsvTables.read(spark, Schema.canonical, s"$tmp/fetch_jobs_*.csv")
    assert(globbed.count() == 3)
  }
}
