package graft

import graft.pipeline.{Extract, Load, Schema, Transform}
import graft.sources.CsvTables
import org.apache.spark.sql.functions._

/** The reference's full daily lifecycle (SURVEY.md §3) end-to-end on the
  * local FS: extract writes daily CSVs -> incremental transform picks up
  * only new files -> load appends to the terminal store exactly once ->
  * BI queries answer from the loaded table. A re-run produces zero new
  * work (S8/S9 semantics).
  */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def kaggleDay(day: Int) = Seq(
    (s"acme $day", s"Senior Data Engineer #$day (Remote)", "full-time",
     "Seattle, WA", "USA", "$120,000", s"2025-10-2$day", "indeed",
     "Looking for python, sql and spark with communication skills."),
    (s"beta $day", s"Analyst iii - $day", "contract", "New York, NY", "US",
     "80", s"2025-10-2$day", "zip recruiter",
     "Needs excel and tableau with teamwork and leadership qualities.")
  ).toDF("company", "title", "job_type", "location", "country",
         "mean_salary", "date_posted", "site", "description")

  test("daily extract -> incremental transform -> idempotent load -> BI query") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lifecycle").toString
    val (rawDir, outDir, tracker) = (s"$tmp/raw", s"$tmp/store", s"$tmp/tracker")

    // --- day 0 and day 1 extracts land as daily CSVs (§3.1) ---
    Seq(0, 1).foreach { day =>
      val extracted = Extract.run(
        kaggle = kaggleDay(day),
        huggingFace = kaggleDay(day).where(lit(false)),
        runDate = s"2025-10-2$day",
        descriptionCol = Some("description"))
      CsvTables.write(extracted, s"$rawDir/fetch_jobs_2025-10-2$day.csv")
    }

    // --- incremental transform+load over the raw listing (§3.2/§3.3) ---
    def listRaw(): Seq[String] =
      new java.io.File(rawDir).list().sorted.toSeq
    def process(f: String) = {
      val df = CsvTables.read(spark, Schema.canonical, s"$rawDir/$f")
        .withColumn("__ingest_id", xxhash64(col("job_title")))
      Transform.transform(df)
    }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("append").parquet(outDir)

    val r1 = Load.loadIncremental(spark, listRaw(), tracker, process, sink)
    assert(r1.size == 2)

    // --- re-run: nothing new to do (S8/S9) ---
    val r2 = Load.loadIncremental(spark, listRaw(), tracker, process, sink)
    assert(r2.isEmpty)

    // --- day 2 arrives; only it is processed ---
    val extracted2 = Extract.run(
      kaggle = kaggleDay(2), huggingFace = kaggleDay(2).where(lit(false)),
      runDate = "2025-10-22", descriptionCol = Some("description"))
    CsvTables.write(extracted2, s"$rawDir/fetch_jobs_2025-10-22.csv")
    val r3 = Load.loadIncremental(spark, listRaw(), tracker, process, sink)
    assert(r3 == Seq("fetch_jobs_2025-10-22.csv"))

    // --- BI queries over the terminal store (§3.4 / Q1-Q12 shapes) ---
    val store = spark.read.parquet(outDir)
    store.createOrReplaceTempView("job_data")
    assert(store.count() == 6) // 2 rows x 3 days, no dupes
    val kpis = spark.sql(
      """SELECT count(*) AS n, count(DISTINCT company_name) AS companies,
        |       count(DISTINCT city) AS cities, round(avg(salary), 2) AS avg_sal
        |FROM job_data""".stripMargin).collect()(0)
    assert(kpis.getLong(0) == 6 && kpis.getLong(1) == 6)
    assert(kpis.getLong(2) == 2) // seattle, new york
    val topSkills = spark.sql(
      """SELECT skill, count(*) AS n
        |FROM (SELECT explode(split(technical_skills, ', ')) AS skill FROM job_data)
        |GROUP BY skill ORDER BY n DESC, skill LIMIT 3""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(topSkills.map(_._1).toSet == Set("excel", "python", "sql") ||
           topSkills.map(_._1).contains("python"), topSkills.toSeq)
    // salaries: acme $120,000 stays, beta hourly 80 -> 160000
    val sal = store.select("salary").distinct().collect().map(_.getDouble(0)).toSet
    assert(sal == Set(120000.0, 160000.0))
  }
}
