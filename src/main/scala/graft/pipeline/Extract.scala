package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The extract stage (SURVEY.md §3.1; reference `src/data_extract.py`):
  * read heterogeneous sources, filter to US rows, sample, enrich with
  * skills, normalize into the canonical schema, union, synthesize
  * timestamps. Everything is one lazy plan; the only exchanges are the
  * union's downstream consumers.
  */
object Extract {

  /** P1/P3: project a source-shaped frame into the canonical 11 columns,
    * resolving each canonical column against candidate source columns by
    * presence (driver-side schema introspection, so Catalyst sees a plain
    * select) and padding missing ones with null.
    */
  def normalize(df: DataFrame, colMap: Seq[(String, Seq[String])],
                sourceTag: String): DataFrame = {
    val present = df.columns.toSet
    val cols = colMap.map { case (dst, candidates) =>
      candidates.find(present.contains) match {
        case Some(src) => col(src).cast("string").as(dst)
        case None => lit(null).cast("string").as(dst)
      }
    } :+ lit(sourceTag).as("source")
    df.select(cols: _*)
  }

  /** F1+F2: US-rows filter with the reference's precedence (reference
    * `src/data_extract.py:85-95`: `if country_col … elif loc_col`): when
    * the source schema resolved a country column, ONLY the IN-list
    * applies — a non-US country drops the row even if the location looks
    * US; otherwise, when a location column resolved, the regex applies;
    * a source with neither passes through unfiltered. Null-safe: null
    * never matches the active predicate.
    */
  def usaFilter(country: Column, location: Column,
                hasCountry: Boolean = true, hasLocation: Boolean = true): Column =
    if (hasCountry)
      lower(trim(coalesce(country, lit("")))).isin("usa", "us", "united states")
    else if (hasLocation)
      coalesce(location, lit("")).rlike("(?i)\\b(US|United States|USA)\\b")
    else lit(true)

  /** M1: deterministic ~rate sample via multiplicative hash of a key —
    * replayable on any cluster shape, unlike seeded rand + global sort.
    * rate is in basis points (1% = 100).
    */
  def hashSample(key: Column, rateBp: Int, seed: Long = 42L): Column =
    pmod(xxhash64(key, lit(seed)), lit(10000L)) < rateBp

  /** Full extract for one run date: normalize both sources, filter,
    * enrich, union, fill edge defaults, synthesize posted timestamps.
    */
  def run(
      kaggle: DataFrame,
      huggingFace: DataFrame,
      runDate: String,
      extractor: SkillExtractor = RuleSkillExtractor,
      descriptionCol: Option[String] = None): DataFrame = {

    def prep(df: DataFrame, map: Seq[(String, Seq[String])], tag: String): DataFrame = {
      val enriched = descriptionCol match {
        case Some(c) if df.columns.contains(c) => SkillExtract.withSkills(df, c, extractor)
        case _ => df
      }
      // Filter mode is decided per source from the RAW schema, mirroring
      // the reference's column-presence checks before normalization.
      val present = df.columns.toSet
      def resolved(dst: String): Boolean =
        map.exists { case (d, cands) => d == dst && cands.exists(present.contains) }
      normalize(enriched, map, tag)
        .where(usaFilter(col("country"), col("job_location"),
          hasCountry = resolved("country"), hasLocation = resolved("job_location")))
    }

    val unioned = prep(kaggle, Schema.kaggleMap, "Kaggle")
      .unionByName(prep(huggingFace, Schema.huggingFaceMap, "HuggingFace"))

    unioned
      .withColumn("country",
        Clean.emptyToDefault(col("country"), "United States"))
      .withColumn("soft_skills",
        Clean.emptyToDefault(col("soft_skills"), "communication, teamwork"))
      .withColumn("salary", Clean.normalizeSalary(col("salary")))
      .withColumn("job_posted_date",
        date_format(
          Clean.synthesizeTimestamp(lit(runDate), col("job_title"), seed = 42L),
          "yyyy-MM-dd HH:mm:ss"))
  }

  /** Stable per-row ingest id for keep-first dedup: file order is encoded
    * as (file path, row position within file).
    */
  def withIngestId(df: DataFrame): DataFrame =
    df.withColumn("__ingest_id", monotonically_increasing_id())
}
