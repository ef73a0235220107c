package graft.pipeline

import org.apache.spark.sql.types._

/** Canonical job-postings schema (SURVEY.md §1.2): the 11-column frame
  * both sources normalize into (reference `src/data_extract.py:160-164`),
  * widened by the transform stage with two derived columns
  * (reference `src/transform.py:145-148`).
  *
  * Divergences from the reference, by design (SURVEY.md §1.3):
  *  - `salary` is nullable double, not int-or-empty-string;
  *  - proper nulls instead of empty-string sentinels (fills happen at the
  *    edges via `Clean.fillDefaults`);
  *  - the multi-label columns stay comma-joined strings at this boundary
  *    for file-level parity, with array forms available via
  *    `Clean.skillsAsArray`.
  */
object Schema {

  val canonical: StructType = StructType(Seq(
    StructField("company_name", StringType),
    StructField("job_title", StringType),
    StructField("job_type", StringType),
    StructField("job_location", StringType),
    StructField("country", StringType),
    StructField("salary", DoubleType),
    StructField("job_posted_date", StringType),
    StructField("job_posted_site", StringType),
    StructField("technical_skills", StringType),
    StructField("soft_skills", StringType),
    StructField("source", StringType)))

  /** Typed row for the post-transform table. */
  final case class JobPosting(
      company_name: String,
      job_title: String,
      cleaned_job_title: String,
      job_type: String,
      job_location: String,
      country: String,
      salary: Option[Double],
      job_posted_date: java.sql.Timestamp,
      job_posted_site: String,
      technical_skills: String,
      soft_skills: String,
      source: String,
      job_posted_year: Option[Int],
      city: String)

  /** Source -> canonical column maps (reference `src/data_extract.py:
    * 172-197`): for each canonical column, the candidate source columns
    * in priority order. Resolution happens against the actual source
    * schema (P3), missing sources become null.
    */
  val kaggleMap: Seq[(String, Seq[String])] = Seq(
    "company_name" -> Seq("company", "company_name"),
    "job_title" -> Seq("title", "job_title"),
    "job_type" -> Seq("job_type", "employment_type"),
    "job_location" -> Seq("location", "job_location"),
    "country" -> Seq("country", "job_country"),
    "salary" -> Seq("mean_salary", "salary"),
    "job_posted_date" -> Seq("date_posted", "job_posted_date"),
    "job_posted_site" -> Seq("site", "job_posted_site"),
    "technical_skills" -> Seq("technical_skills"),
    "soft_skills" -> Seq("soft_skills"))

  val huggingFaceMap: Seq[(String, Seq[String])] = Seq(
    "company_name" -> Seq("company_name"),
    "job_title" -> Seq("job_title", "job_title_short"),
    "job_type" -> Seq("job_schedule_type", "job_type"),
    "job_location" -> Seq("job_location"),
    "country" -> Seq("job_country", "country"),
    "salary" -> Seq("salary_year_avg", "salary"),
    "job_posted_date" -> Seq("job_posted_date"),
    "job_posted_site" -> Seq("job_via", "site"),
    "technical_skills" -> Seq("technical_skills"),
    "soft_skills" -> Seq("soft_skills"))
}
