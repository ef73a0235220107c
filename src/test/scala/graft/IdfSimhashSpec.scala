package graft

import org.apache.spark.sql.functions._

/** Why the idf-weighted simhash (q79) exists next to the frequency-
  * weighted one (q71): on a corpus where every document shares a bulky
  * common vocabulary and only a few RARE tokens carry the signal, the
  * unweighted signature collapses (shared tokens dominate every bit sum)
  * while the idf weighting separates documents by their discriminative
  * tokens. Deterministic synthetic corpus — no randomness.
  */
class IdfSimhashSpec extends SparkSpec {

  // 10 topics × 10 docs. Every doc: 10 shared words twice (bulk), its
  // topic's 5 words twice (signal). Topic-word df = 10 of N = 100 docs
  // -> integer idf weight 1 + floor(log2(10)) = 4; shared df = 100 -> 1.
  private lazy val corpus = {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"common$i")
    val rows = for {
      topic <- 0 until 10
      k <- 0 until 10
    } yield {
      val topicWords = (0 until 5).map(j => s"topic${topic}word$j")
      val text = (shared ++ shared ++ topicWords ++ topicWords).mkString(" ")
      (topic.toLong * 10 + k, topic, text)
    }
    rows.toDF("doc_id", "topic", "text")
  }

  private def hammings(idfWeighted: Boolean): (Double, Double) = {
    val sigs = graft.queries.TextOps
      .simhashSignatures(corpus.select(col("doc_id"), col("text")), idfWeighted)
      .join(corpus.select(col("doc_id"), col("topic")), "doc_id")
    val pairs = sigs.as("x").join(sigs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select((col("x.topic") === col("y.topic")).as("same"),
              bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("double").as("h"))
    val agg = pairs.groupBy(col("same")).agg(avg(col("h")).as("mh"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    (agg(true), agg(false)) // (within-topic, cross-topic)
  }

  test("idf weighting separates topics the frequency weighting cannot") {
    val (idfWithin, idfCross) = hammings(idfWeighted = true)
    val (rawWithin, rawCross) = hammings(idfWeighted = false)
    // weighted: same-topic docs are identical token multisets -> identical
    // signatures; different topics differ in the dominant (weighted) bits
    assert(idfWithin === 0.0)
    assert(idfCross > idfWithin + 5.0, s"cross=$idfCross within=$idfWithin")
    // unweighted: the shared bulk vocabulary drags all signatures
    // together — topics are measurably LESS separated than with idf
    assert(idfCross > rawCross + 5.0, s"idfCross=$idfCross rawCross=$rawCross")
  }

  test("q79 signatures are deterministic under repartitioning") {
    val q = queries.Registry.byName("q79_docs_idf_simhash")
    val a = q.run(spark, sfDir).collect().map(_.toSeq)
    val b = q.run(spark, sfDir).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }
}
