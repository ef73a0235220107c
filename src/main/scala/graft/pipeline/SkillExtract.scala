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

  /** Batch hook used by the mapPartitions plumbing: implementations with
    * remote calls fan a chunk out under their own concurrency bound; the
    * default is sequential.
    */
  def extractBatch(descriptions: Seq[String]): Seq[(String, String)] =
    descriptions.map(extract)
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
  * auth / model wiring stays outside the engine — reference
  * `data_extract.py:108-135`). Production hardening, all hermetically
  * testable through the injected `call`/`sleeper`:
  *
  *  - bounded concurrency: `extractBatch` fans a chunk out on a pool of
  *    `concurrency` threads, so one executor never holds more than that
  *    many calls in flight (rate-limit friendliness);
  *  - retry with linear backoff: transient failures retry up to
  *    `maxRetries` times before degrading to ("","") — the reference's
  *    error guard, but only after the call had its chances;
  *  - memoization: repeated descriptions (boilerplate postings) hit the
  *    per-extractor cache, not the endpoint;
  *  - cost cap: at most `maxCalls` call attempts per extractor instance
  *    (per task); beyond the budget everything degrades to ("","")
  *    instead of running up the bill.
  */
final class LlmSkillExtractor(
    call: String => String,
    maxChars: Int = 4000,
    concurrency: Int = 4,
    maxRetries: Int = 2,
    retryDelayMs: Long = 100L,
    maxCalls: Long = Long.MaxValue,
    sleeper: Long => Unit = Thread.sleep) extends SkillExtractor {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  @transient private lazy val attempts =
    new java.util.concurrent.atomic.AtomicLong()

  /** Call attempts made so far (includes retries) — cost observability. */
  def callsAttempted: Long = attempts.get()

  private def parse(resp: String): (String, String) = {
    def section(tag: String): String =
      resp.linesIterator.find(_.startsWith(tag))
        .map(_.stripPrefix(tag).trim).getOrElse("")
    (section("TECH:"), section("SOFT:"))
  }

  private def callWithRetry(text: String): (String, String) = {
    var attempt = 0
    while (attempt <= maxRetries) {
      if (attempts.incrementAndGet() > maxCalls) return ("", "") // budget gone
      try return parse(call(text))
      catch {
        case _: Exception =>
          attempt += 1
          if (attempt <= maxRetries) sleeper(retryDelayMs * attempt)
      }
    }
    ("", "") // retries exhausted: degrade, never fail the task
  }

  override def extract(description: String): (String, String) = {
    if (description == null || description.trim.length < 30) return ("", "")
    val text = description.take(maxChars)
    val cached = cache.get(text)
    if (cached != null) return cached
    val out = callWithRetry(text)
    cache.put(text, out)
    out
  }

  override def extractBatch(descriptions: Seq[String]): Seq[(String, String)] = {
    val n = math.max(1, math.min(concurrency, descriptions.size))
    if (n == 1) return descriptions.map(extract)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    try {
      descriptions
        .map(t => pool.submit(new java.util.concurrent.Callable[(String, String)] {
          override def call(): (String, String) = extract(t)
        }))
        .map(_.get())
    } finally pool.shutdown()
  }
}

/** Real HTTP transport for [[LlmSkillExtractor]] — the production `call`
  * implementation the trait left injected until round 5 (reference
  * `src/data_extract.py:108-135`: each description is posted to a
  * chat-completions endpoint and one message comes back). Zero new
  * dependencies: `java.net.http.HttpClient` (async send; the harness's
  * pool threads block on the future while socket work runs on the
  * client's selector threads, so `concurrency` bounds in-flight
  * REQUESTS, not parked sockets) and Spark's bundled Jackson for JSON
  * on both sides — hand-rolled string escaping is how request-injection
  * bugs happen.
  *
  * Wire shape is the public chat-completions convention: request
  * `{"model": m, "messages": [{"role": "user", "content": prompt}]}`,
  * response content at `choices[0].message.content`, expected to carry
  * the extractor's `TECH:`/`SOFT:` lines (the instruction prompt asks
  * for exactly that). Every failure mode — non-2xx status (429s and
  * 5xxs included), connect/read timeout, malformed body — surfaces as
  * an exception, which the [[LlmSkillExtractor]] harness owns: retry
  * with backoff under the cost cap, then degrade to ("", ""), never
  * fail the task (the reference's error guard, `data_extract.py:131-135`).
  *
  * One instance per extractor is fine across partitions: state is an
  * endpoint string plus transient lazies, so Spark serializes the
  * config and each executor builds its own client on first use.
  */
final class HttpLlmClient(
    endpoint: String,
    model: String = "skill-extract-1",
    headers: Map[String, String] = Map.empty,
    timeoutMs: Long = 30000L) extends (String => String) with Serializable {

  @transient private lazy val client =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
      .build()
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Exposed for the hermetic spec: the exact request body for `text`. */
  private[graft] def requestBody(text: String): String = {
    val root = mapper.createObjectNode()
    root.put("model", model)
    val msg = root.putArray("messages").addObject()
    msg.put("role", "user")
    msg.put("content", HttpLlmClient.instruction + text)
    mapper.writeValueAsString(root)
  }

  override def apply(text: String): String = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
    headers.foreach { case (k, v) => b.header(k, v) }
    val req = b.POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(requestBody(text), java.nio.charset.StandardCharsets.UTF_8))
      .build()
    // sendAsync + join: an IO failure or timeout surfaces as
    // CompletionException — an Exception, so the retry harness owns it.
    // Stream the body and cap what is read: a misbehaving endpoint
    // must not be able to buffer an unbounded response into executor
    // memory before the parse rejects it.
    val resp = client.sendAsync(req,
      java.net.http.HttpResponse.BodyHandlers.ofInputStream()).join()
    // any 2xx is success (the documented contract — a gateway may
    // answer 201/202); everything else is a failure for the retry
    // harness to classify
    if (resp.statusCode() / 100 != 2) {
      resp.body().close()
      throw new java.io.IOException(
        s"LLM endpoint returned HTTP ${resp.statusCode()}")
    }
    val body = try {
      val buf = resp.body().readNBytes(HttpLlmClient.MaxBodyBytes + 1)
      if (buf.length > HttpLlmClient.MaxBodyBytes)
        throw new java.io.IOException(
          s"LLM response body exceeds ${HttpLlmClient.MaxBodyBytes} bytes")
      new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    } finally resp.body().close()
    val content = mapper.readTree(body)
      .path("choices").path(0).path("message").path("content")
    if (!content.isTextual)
      throw new java.io.IOException(
        s"malformed LLM response body: ${body.take(200)}")
    content.asText()
  }
}

object HttpLlmClient {
  /** Response-size cap: a skill list is a few hundred bytes; 4 MiB is
    * generous headroom for verbose providers while bounding what a
    * broken endpoint can push into an executor.
    */
  final val MaxBodyBytes: Int = 4 * 1024 * 1024

  /** The instruction prefix that makes any instruction-following model
    * answer in the two-line format [[LlmSkillExtractor]] parses.
    */
  val instruction: String =
    "Extract skills from the job description below. Reply with exactly " +
      "two lines:\nTECH: <comma-separated technical skills>\n" +
      "SOFT: <comma-separated soft skills>\n\n"

  /** The fully-wired production extractor: HTTP transport under the
    * concurrency/retry/cost-cap harness.
    */
  def extractor(
      endpoint: String,
      model: String = "skill-extract-1",
      headers: Map[String, String] = Map.empty,
      timeoutMs: Long = 30000L,
      maxChars: Int = 4000,
      concurrency: Int = 4,
      maxRetries: Int = 2,
      retryDelayMs: Long = 100L,
      maxCalls: Long = Long.MaxValue): LlmSkillExtractor =
    new LlmSkillExtractor(
      call = new HttpLlmClient(endpoint, model, headers, timeoutMs),
      maxChars = maxChars, concurrency = concurrency,
      maxRetries = maxRetries, retryDelayMs = retryDelayMs,
      maxCalls = maxCalls)
}

object SkillExtract {
  /** Adds `technical_skills` / `soft_skills` extracted from
    * `descriptionCol`. Runs via mapPartitions so extractor state
    * (dictionaries, HTTP clients, caches) is per-partition, not per-row;
    * rows stream through in `batchSize` chunks so a remote extractor can
    * fan each chunk out under its concurrency bound while memory stays
    * bounded.
    */
  def withSkills(
      df: DataFrame,
      descriptionCol: String,
      extractor: SkillExtractor = RuleSkillExtractor,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("technical_skills", StringType),
      StructField("soft_skills", StringType)))
    val enc = ExpressionEncoder(outSchema)
    val idx = df.schema.fieldIndex(descriptionCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { chunk =>
        val outs = extractor.extractBatch(
          chunk.map(r => if (r.isNullAt(idx)) null else r.getString(idx)))
        chunk.lazyZip(outs).map { case (r, (tech, soft)) =>
          Row.fromSeq(r.toSeq ++ Seq(tech, soft))
        }
      }
    }(enc)
  }
}
