package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.pipeline.{LlmSkillExtractor, SkillExtract}

/** X1 hardening: the LLM-backed extractor's retry, degradation,
  * memoization, concurrency bound, and cost cap — all through injected
  * fakes, no endpoint.
  */
class LlmExtractorSpec extends SparkSpec {
  import spark.implicits._

  private val desc = "We need python and sql with communication skills, plenty of text."
  private val ok = "TECH: python, sql\nSOFT: communication"

  test("transient failures retry with backoff, then succeed") {
    val calls = new AtomicInteger()
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ex = new LlmSkillExtractor(
      call = _ => if (calls.incrementAndGet() < 3) sys.error("http 429") else ok,
      maxRetries = 2, retryDelayMs = 7L, sleeper = delays += _)
    assert(ex.extract(desc) == (("python, sql", "communication")))
    assert(calls.get() == 3)
    assert(delays.toSeq == Seq(7L, 14L)) // linear backoff, injected sleeper
  }

  test("exhausted retries degrade to empty, never throw") {
    val calls = new AtomicInteger()
    val ex = new LlmSkillExtractor(
      call = _ => { calls.incrementAndGet(); sys.error("down") },
      maxRetries = 2, sleeper = _ => ())
    assert(ex.extract(desc) == (("", "")))
    assert(calls.get() == 3) // initial + 2 retries
  }

  test("repeated descriptions are memoized: one call per distinct text") {
    val calls = new AtomicInteger()
    val ex = new LlmSkillExtractor(
      call = _ => { calls.incrementAndGet(); ok }, sleeper = _ => ())
    (1 to 5).foreach(_ => ex.extract(desc))
    assert(calls.get() == 1)
    assert(ex.callsAttempted == 1)
  }

  test("batch fan-out respects the concurrency bound and parallelizes") {
    val inFlight = new AtomicInteger()
    val maxSeen = new AtomicInteger()
    val ex = new LlmSkillExtractor(
      call = _ => {
        val now = inFlight.incrementAndGet()
        maxSeen.getAndUpdate(m => math.max(m, now))
        Thread.sleep(20)
        inFlight.decrementAndGet()
        ok
      },
      concurrency = 4, sleeper = _ => ())
    val texts = (1 to 16).map(i => s"$desc unique tail $i")
    val out = ex.extractBatch(texts)
    assert(out.forall(_ == (("python, sql", "communication"))))
    assert(maxSeen.get() <= 4, s"bound violated: ${maxSeen.get()} in flight")
    assert(maxSeen.get() >= 2, "no overlap at all — batch ran sequentially")
  }

  test("cost cap: attempts beyond the budget degrade instead of calling") {
    val calls = new AtomicInteger()
    val ex = new LlmSkillExtractor(
      call = _ => { calls.incrementAndGet(); ok },
      concurrency = 1, maxCalls = 5, sleeper = _ => ())
    val texts = (1 to 10).map(i => s"$desc distinct posting number $i")
    val out = ex.extractBatch(texts)
    assert(calls.get() == 5) // the endpoint saw exactly the budget
    assert(out.count(_ == (("python, sql", "communication"))) == 5)
    assert(out.count(_ == (("", ""))) == 5)
  }

  test("withSkills drives the batch path under Spark") {
    // locals only: the closure must not capture the (non-serializable)
    // suite instance
    val reply = ok
    val ex = new LlmSkillExtractor(call = _ => reply, sleeper = _ => ())
    val df = (1 to 8).map(i => (i.toLong, s"unique posting number $i needing python and communication"))
      .toDF("id", "description")
      .coalesce(1)
    val out = SkillExtract.withSkills(df, "description", ex, batchSize = 4)
      .collect()
    assert(out.length == 8)
    assert(out.forall(_.getString(2) == "python, sql"))
    assert(out.forall(_.getString(3) == "communication"))
  }
}
