package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The transform stage (SURVEY.md §3.2; reference `src/transform.py:
  * 99-150`): one declarative plan — coerce types, clean text, classify
  * job type, fill defaults, flatten skill lists, dedup keep-first,
  * range-filter salary, derive year/city.
  *
  * The whole chain is narrow except the dedup window, which shuffles once
  * on the dedup key — at 100 TB that is the only exchange in the stage.
  */
object Transform {

  val dedupKeys = Seq("company_name", "job_title", "job_location", "job_posted_site")

  /** @param df canonical-schema frame (Schema.canonical + optional extras)
    * @param orderCol column defining "first" for keep-first dedup; callers
    *        reading ordered files should derive it from the input order
    *        (e.g. file mod-time + row position) — see `Extract.withIngestId`.
    */
  def transform(df: DataFrame, orderCol: String = "__ingest_id"): DataFrame = {
    val withOrder =
      if (df.columns.contains(orderCol)) df
      else df.withColumn(orderCol, monotonically_increasing_id())

    val coerced = withOrder
      .withColumn("job_posted_date", Clean.coerceTimestamp(col("job_posted_date")))
      .withColumn("salary", Clean.coerceNumeric(col("salary")))

    val lowered = Seq("company_name", "job_title", "job_type", "job_location",
                      "job_posted_site")
      .foldLeft(coerced)((d, c) => d.withColumn(c, Clean.lowerTrim(col(c))))

    val cleaned = lowered
      .withColumn("cleaned_job_title", Clean.cleanJobTitle(col("job_title")))
      .withColumn("job_type", Clean.inferJobType(col("job_type"), col("job_title")))
      .withColumn("company_name",
        Clean.emptyToDefault(col("company_name"), "Unknown"))
      .withColumn("technical_skills",
        Clean.flattenSkills(Clean.emptyToDefault(col("technical_skills"), "not listed")))
      .withColumn("soft_skills",
        Clean.flattenSkills(Clean.emptyToDefault(col("soft_skills"), "not listed")))

    val deduped = Clean.dedupKeepFirst(cleaned, dedupKeys, orderCol)

    deduped
      .where(col("salary").between(20000, 400000))
      .withColumn("job_posted_year", Clean.yearOf(col("job_posted_date")))
      .withColumn("city", Clean.cityOf(col("job_location")))
      .drop(orderCol)
  }
}
