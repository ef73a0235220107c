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

  test("scheme-qualified URIs read through the same path as plain paths") {
    // The S3 waiver's testable half (SURVEY §2.16): every source goes
    // through one Hadoop-filesystem code path, so an explicit scheme
    // (file: here; s3a: in deployment) must behave identically to a
    // bare path — same FileIndex listing, same glob semantics, same
    // rows. Zero-egress sandbox: file: is the scheme we CAN exercise.
    val tmp = java.nio.file.Files.createTempDirectory("graft_scheme").toString
    val rows = Seq(("acme", "engineer", "Full-Time", "seattle, wa",
      "United States", Some(120000.0), "2025-10-20 09:15:00", "indeed",
      "python", "teamwork", "Kaggle"))
      .toDF(graft.pipeline.Schema.canonical.fields.map(_.name): _*)
    CsvTables.write(rows, s"$tmp/fetch_jobs_2025-10-20.csv")
    val plain = CsvTables.read(spark, Schema.canonical,
      s"$tmp/fetch_jobs_*.csv").collect().map(_.toSeq)
    val scheme = CsvTables.read(spark, Schema.canonical,
      s"file://$tmp/fetch_jobs_*.csv").collect().map(_.toSeq)
    assert(plain.nonEmpty && plain.toSeq == scheme.toSeq)
    // and the parquet table path (Tables.documents et al. at s3a:// in
    // deployment) — same equality through an explicit scheme
    val viaPlain = Tables.documents(spark, sfDir).count()
    val viaScheme = Tables.documents(spark, s"file://$sfDir").count()
    assert(viaPlain > 0 && viaPlain == viaScheme)
  }

  test("PERMISSIVE read degrades malformed cells to nulls, not task failures") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_badcsv").toString
    // salary column gets junk; one row is missing trailing columns
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$tmp/bad.csv"),
      Schema.canonical.fields.map(_.name).mkString(",") + "\n" +
      "acme,eng,Full-Time,nyc,US,not_a_number,2025-10-20 09:00:00,indeed,sql,teamwork,Kaggle\n" +
      "beta,analyst,Contract,la,US,90000,2025-10-20 10:00:00,indeed,excel,grit,Kaggle\n" +
      "gamma,short,row\n")
    val df = CsvTables.read(spark, Schema.canonical, s"$tmp/bad.csv")
    val rows = df.collect()
    assert(rows.length == 3) // nothing dropped, nothing thrown
    val acme = df.where(col("company_name") === "acme").collect()(0)
    assert(acme.isNullAt(acme.fieldIndex("salary"))) // junk -> null
    val beta = df.where(col("company_name") === "beta").collect()(0)
    assert(beta.getAs[Double]("salary") == 90000.0)
    val gamma = df.where(col("company_name") === "gamma").collect()(0)
    assert(gamma.isNullAt(gamma.fieldIndex("source"))) // short row padded
  }
}
