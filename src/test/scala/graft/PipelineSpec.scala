package graft

import graft.pipeline.{Extract, Load, RuleSkillExtractor, Schema, SkillExtract, Transform}
import org.apache.spark.sql.functions._

/** End-to-end pipeline semantics: source normalization (P1/P3), the USA
  * filter (F1/F2), skill enrichment (X1/X2), transform chain (§3.2), and
  * the idempotent incremental load (S8/S9).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def kaggleRaw = Seq(
    ("Acme Corp", "Senior Data Engineer (Remote)", "full-time", "Seattle, WA",
     "USA", "$85,000", "2025-10-20", "indeed",
     "We need strong python and sql skills plus communication abilities."),
    ("Beta LLC", "ML Engineer ii", "", "Paris", "France", "90000",
     "2025-10-20", "indeed", "short"),
    ("Acme Corp", "Senior Data Engineer (Remote)", "full-time", "Seattle, WA",
     "USA", "$95,000", "2025-10-20", "indeed",
     "We need strong python and sql skills plus communication abilities."),
    ("Gamma Inc", "Analyst", "contract", "New York, NY", "US", "60",
     "2025-10-20", "zip recruiter",
     "Analyst role requiring excel and tableau plus teamwork and leadership.")
  ).toDF("company", "title", "job_type", "location", "country", "mean_salary",
         "date_posted", "site", "description")

  test("P1/P3 normalization resolves candidate columns and pads missing") {
    val out = Extract.normalize(kaggleRaw, Schema.kaggleMap, "Kaggle")
    assert(out.columns.toSeq ==
      Schema.canonical.fields.map(_.name).toSeq)
    val first = out.where(col("company_name") === "Acme Corp").collect()(0)
    assert(first.getAs[String]("job_title") == "Senior Data Engineer (Remote)")
    assert(first.getAs[String]("technical_skills") == null) // padded
    assert(out.select("source").distinct().collect()(0).getString(0) == "Kaggle")
  }

  test("F1/F2 USA filter drops non-US rows") {
    val out = Extract.normalize(kaggleRaw, Schema.kaggleMap, "Kaggle")
      .where(Extract.usaFilter(col("country"), col("job_location")))
    assert(out.count() == 3) // Beta LLC (France, Paris) dropped
  }

  test("F1/F2 precedence: country column wins over US-looking location") {
    // Reference data_extract.py:85-95 is `if country_col … elif loc_col`:
    // with a country column present, ONLY the IN-list applies.
    val rows = Seq(
      ("A", "France", "Paris, US office"), // non-US country, US-ish location => DROP
      ("B", "USA", "Lyon"),                // US country, non-US location   => KEEP
      ("C", null.asInstanceOf[String], "Boston, US") // null country        => DROP
    ).toDF("company", "country", "location")
    val kept = rows.where(Extract.usaFilter(col("country"), col("location"),
      hasCountry = true, hasLocation = true))
    assert(kept.select("company").as[String].collect().toSeq == Seq("B"))

    // Without a country column the location regex is the active predicate.
    val byLoc = rows.where(Extract.usaFilter(col("country"), col("location"),
      hasCountry = false, hasLocation = true))
    assert(byLoc.select("company").as[String].collect().sorted.toSeq == Seq("A", "C"))

    // Neither column resolved: pass-through (reference returns df unchanged).
    assert(rows.where(Extract.usaFilter(col("country"), col("location"),
      hasCountry = false, hasLocation = false)).count() == 3)
  }

  test("X1 rule extractor finds dictionary skills; short text guarded") {
    assert(RuleSkillExtractor.extract(
      "We need strong python and sql skills plus communication abilities.") ==
      ("python, sql", "communication"))
    assert(RuleSkillExtractor.extract("short") == ("", ""))
    assert(RuleSkillExtractor.extract(null) == ("", ""))
  }

  test("X2 mapPartitions enrichment appends both columns") {
    val out = SkillExtract.withSkills(kaggleRaw, "description")
    assert(out.columns.takeRight(2).toSeq == Seq("technical_skills", "soft_skills"))
    val gamma = out.where(col("company") === "Gamma Inc").collect()(0)
    assert(gamma.getAs[String]("technical_skills") == "tableau, excel")
    assert(gamma.getAs[String]("soft_skills") == "teamwork, leadership")
  }

  test("extract+transform end-to-end: dedup, salary rules, derived columns") {
    val extracted = Extract.run(
      kaggle = kaggleRaw,
      huggingFace = kaggleRaw.where(lit(false)),
      runDate = "2025-10-21",
      descriptionCol = Some("description"))
    val withOrder = extracted.withColumn("__ingest_id",
      xxhash64(col("company_name"), col("salary")))
    val out = Transform.transform(withOrder)
    val rows = out.collect()
    // Beta dropped by USA filter; Acme duplicates collapse to one;
    // Gamma hourly 60 -> 120000 passes range filter
    assert(rows.length == 2)
    val acme = out.where(col("company_name") === "acme corp").collect()(0)
    assert(acme.getAs[String]("cleaned_job_title") == "Data Engineer")
    assert(acme.getAs[String]("job_type") == "Full-Time")
    assert(acme.getAs[String]("city") == "seattle")
    assert(acme.getAs[Int]("job_posted_year") == 2025)
    assert(acme.getAs[String]("technical_skills") == "python, sql")
    val gamma = out.where(col("company_name") === "gamma inc").collect()(0)
    assert(gamma.getAs[Double]("salary") == 120000.0)
    assert(gamma.getAs[String]("job_type") == "Contract")
  }

  test("C16 timestamp synthesis is deterministic and in 09:00-22:59") {
    val extracted = Extract.run(
      kaggle = kaggleRaw, huggingFace = kaggleRaw.where(lit(false)),
      runDate = "2025-10-21")
    val again = Extract.run(
      kaggle = kaggleRaw, huggingFace = kaggleRaw.where(lit(false)),
      runDate = "2025-10-21")
    val a = extracted.select("job_posted_date").collect().map(_.getString(0)).sorted
    val b = again.select("job_posted_date").collect().map(_.getString(0)).sorted
    assert(a.sameElements(b))
    assert(a.forall(_.startsWith("2025-10-21 ")))
    val hours = a.map(_.substring(11, 13).toInt)
    assert(hours.forall(h => h >= 9 && h <= 22))
  }

  test("S8/S9 incremental load processes each file exactly once") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_load").toString
    val tracker = s"$tmp/tracker"
    var processed = List.empty[String]
    def process(f: String) = { processed :+= f; Seq((f, 1)).toDF("f", "n") }
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("append").parquet(s"$tmp/out")

    val r1 = Load.loadIncremental(spark, Seq("a.csv", "b.csv"), tracker, process, sink)
    assert(r1 == Seq("a.csv", "b.csv"))
    val r2 = Load.loadIncremental(spark, Seq("a.csv", "b.csv", "c.csv"), tracker, process, sink)
    assert(r2 == Seq("c.csv"))
    assert(processed == List("a.csv", "b.csv", "c.csv"))
    assert(spark.read.parquet(s"$tmp/out").count() == 3)
  }
}
