package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One word type during BPE training: corpus frequency + current symbol
  * sequence (top-level case class for by-name encoder resolution).
  */
final case class WordSyms(word: String, freq: Long, syms: Seq[String])

/** One learned merge: the round's winning adjacent pair, its
  * frequency-weighted corpus count, and the corpus symbol count after
  * applying the merge (which certifies the non-overlapping application,
  * since overlapping occurrences like "aaa" merge fewer times than the
  * pair count suggests).
  */
final case class BpeMerge(round: Long, a: String, b: String, pair_n: Long,
                          corpus_syms_after: Long)

/** Encoder input/output rows (top-level for by-name encoder resolution). */
final case class BpeEncIn(doc_id: Long, text: String)
final case class BpeEncOut(doc_id: Long, n_words: Long, n_pieces: Long,
                           pieces_hash: Long)

/** Byte-pair-encoding merge LEARNING (Sennrich et al. 2016) — the
  * tokenizer-training half that q97's greedy inference consumes.
  * Start from per-character symbols over the distinct-word table
  * (weighted by corpus frequency — BPE's standard word-type
  * optimization: the corpus enters only through `freq`), then per
  * round: count adjacent symbol pairs, pick the most frequent
  * (count DESC, pair ASC — deterministic), and merge its
  * non-overlapping left-to-right occurrences in every word.
  *
  * Distributed shape per round: one pair-count aggregate (the only
  * shuffle; input is one row per word TYPE, Zipf-bounded, not per
  * token), a 1-row argmax collect (the iterative driver step, exactly
  * like q60's convergence check), and a narrow merge map over the word
  * table, localCheckpoint'd so round k's plan does not re-execute
  * rounds 1..k-1. At 100 TB the word-type table is the only state and
  * it SHRINKS relative to the corpus as scale grows.
  */
object BpeTrain {

  /** Merge non-overlapping (a,b) occurrences left to right — the
    * standard BPE application rule: after "aaa" with pair (a,a) the
    * result is ["aa","a"], not ["aa","aa"].
    */
  private[graft] def applyMerge(a: String, b: String,
                                syms: Seq[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Learn `k` merges from a one-column DataFrame of word occurrences
    * (`w`, non-empty). Returns the merge table ordered by round.
    */
  def learnMerges(s: SparkSession, words: DataFrame, k: Int): DataFrame = {
    import s.implicits._
    var syms = words.groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w").as("word"), col("freq"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"))
      .as[WordSyms]
      .localCheckpoint()
    val merges = Seq.newBuilder[BpeMerge]
    var r = 1
    var exhausted = false
    while (r <= k && !exhausted) {
      val pairs = syms.toDF()
        .select(col("freq"), explode_outer(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .where(col("p").isNotNull)
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(desc("n"), col("a"), col("b"))
        .limit(1).collect()
      if (pairs.isEmpty) {
        // no adjacent pairs left (every word is a single symbol, or the
        // corpus started as single-character words): standard BPE
        // termination — return the merges learned so far
        exhausted = true
      } else {
        val best = pairs.head
        val (a, b, n) = (best.getString(0), best.getString(1), best.getLong(2))
        syms = syms.map(ws => ws.copy(syms = applyMerge(a, b, ws.syms)))
          .localCheckpoint()
        val after = syms.toDF()
          .agg(sum(col("freq") * size(col("syms")))).collect().head.getLong(0)
        merges += BpeMerge(r.toLong, a, b, n, after)
        r += 1
      }
    }
    s.createDataFrame(merges.result()).orderBy(col("round"))
  }

  /** The word-TYPE table after applying a learned merge-list prefix —
    * (word, freq, syms), the `s<r>` state of training replayed from a
    * known merge list in one narrow map (no per-round checkpoints: the
    * fold is O(merges·len) per word type and the type table is
    * Zipf-bounded). Powers q159's vocab-size/compression curve, where
    * each rung reads the corpus-piece and distinct-symbol counts off
    * this table.
    */
  def wordTypes(s: SparkSession, words: DataFrame,
                merges: Seq[(String, String)]): DataFrame = {
    import s.implicits._
    words.groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w").as("word"), col("freq"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
          .as("syms"))
      .as[WordSyms]
      .map(ws => ws.copy(syms = merges.foldLeft(ws.syms) {
        case (acc, (a, b)) => applyMerge(a, b, acc)
      }))
      .toDF()
  }

  /** Encode every document with a learned merge list (applied in rank
    * order per word — standard BPE inference). Row-local work: the
    * merge table rides along as a tiny task closure and each partition
    * memoizes word → pieces (the same Zipf argument that makes
    * training's word-TYPE table small makes the memo hit rate high).
    * Output pins the full encoding: piece count and the polynomial
    * hash of the space-joined piece stream in word order.
    */
  def encode(s: SparkSession, docs: DataFrame,
             merges: Seq[(String, String)]): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id"), col("text")).as[BpeEncIn]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Seq[String]]()
        def pieces(word: String): Seq[String] = {
          val hit = memo.get(word)
          if (hit != null) hit
          else {
            var syms: Seq[String] =
              word.codePoints().toArray.toSeq
                .map(cp => new String(Character.toChars(cp)))
            merges.foreach { case (a, b) => syms = applyMerge(a, b, syms) }
            memo.put(word, syms)
            syms
          }
        }
        it.map { row =>
          val words = row.text.split(" ", -1).filter(_.nonEmpty)
          val enc = words.map(pieces)
          val stream = enc.iterator.map(_.mkString(" ")).mkString(" ")
          BpeEncOut(row.doc_id, words.length.toLong,
            enc.iterator.map(_.length.toLong).sum,
            graft.functions.TextHash.polyHash(
              org.apache.spark.unsafe.types.UTF8String.fromString(stream), 31))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }
}
