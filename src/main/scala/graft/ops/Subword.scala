package graft.ops

import graft.functions.TextHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** One tokenized document (top-level case class so the Dataset encoder
  * resolves fields by name — see PackIn).
  */
final case class SubwordDoc(doc_id: Long, n_words: Long, n_chars: Long,
                            n_tokens: Long, n_fallback: Long, tok_hash: Long)

/** Greedy longest-match subword tokenizer (WordPiece-style inference):
  * learn a vocabulary from the corpus (most frequent words + most
  * frequent character 2-grams), then tokenize every document by
  * repeatedly taking the longest vocab piece matching at the cursor,
  * falling back to a single character when nothing matches.
  *
  * Scale shape is the production one: vocab learning is two top-k
  * aggregates (the only shuffles), the learned vocab — always small by
  * construction — is a driver collect + broadcast exactly like a real
  * tokenizer's vocab file, and tokenization itself is a SHUFFLE-FREE
  * narrow mapPartitions pass with a per-partition word→pieces memo
  * (Zipf's law makes the hit rate ~the corpus's type-token ratio, the
  * same trick HF tokenizers use). At 100 TB the memo bounds per-task
  * work by distinct-words-per-partition, not tokens.
  *
  * Everything downstream of the vocab is a deterministic function of
  * the text (greedy matching has no ties: two equal-length matches at
  * one position are the same string), so the DuckDB oracle replays the
  * whole thing: vocab via the same top-k with (count DESC, token ASC)
  * tie-breaks, per-position best matches via a join + row_number, and
  * the greedy walk via a recursive CTE over the distinct words.
  */
object Subword {

  /** Learn the vocab: top `topWords` whole words + top `topGrams`
    * character 2-grams by corpus frequency, ties broken by token text so
    * the boundary is engine-deterministic. `words` must be one non-empty
    * word occurrence per row in column `w`.
    */
  def learnVocab(words: DataFrame, topWords: Int, topGrams: Int): Array[String] = {
    val topW = words.groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(topWords).select(col("w"))
    val topG = words.where(length(col("w")) >= 2)
      .select(explode_outer(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("w"))
      .where(col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w")).limit(topGrams).select(col("w"))
    // two tiny top-k results: the collect is the vocab-file read of a
    // real tokenizer, not a data-path collect
    topW.union(topG).distinct().collect().map(_.getString(0)).sorted
  }

  /** Greedy longest-match of one word against the vocab. Codepoint-exact
    * (positions and lengths count codepoints, matching DuckDB substr/len
    * on supplementary characters). Returns (nPieces, nFallback) and
    * appends the space-joined pieces to `sb`.
    */
  private[graft] def tokenizeWord(vocab: Set[String], maxLen: Int,
                                  word: String, sb: StringBuilder): (Int, Int) = {
    val cps = word.codePoints().toArray
    var pos = 0; var nP = 0; var nF = 0
    while (pos < cps.length) {
      var l = math.min(maxLen, cps.length - pos)
      var piece: String = null
      while (piece == null && l >= 1) {
        val cand = new String(cps, pos, l)
        if (vocab.contains(cand)) piece = cand else l -= 1
      }
      var adv = l
      if (piece == null) { piece = new String(cps, pos, 1); adv = 1; nF += 1 }
      if (sb.nonEmpty) sb.append(' ')
      sb.append(piece)
      nP += 1
      pos += adv
    }
    (nP, nF)
  }

  /** Tokenize every document: learn the vocab from `docs` (columns
    * `doc_id` LONG, `text` STRING), broadcast it, and run the narrow
    * per-doc pass. `tok_hash` is the portable polynomial hash of the
    * document's full space-joined piece sequence, so any divergence in
    * vocab choice, match order, or fallback breaks the oracle hash.
    */
  def tokenize(s: SparkSession, docs: DataFrame,
               topWords: Int, topGrams: Int): DataFrame = {
    import s.implicits._
    val words = docs.select(explode_outer(split(col("text"), " ")).as("w"))
      .where(col("w").isNotNull && col("w") =!= "")
    val bc = s.sparkContext.broadcast(learnVocab(words, topWords, topGrams))
    val idIdx = docs.schema.fieldIndex("doc_id")
    val txtIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { rows =>
      val vset: Set[String] = bc.value.toSet
      val maxLen = if (bc.value.isEmpty) 1 else bc.value.map(_.length).max
      val memo = new java.util.HashMap[String, (String, Int, Int)]()
      rows.map { r =>
        val text = r.getString(txtIdx)
        val docSb = new StringBuilder
        var nW = 0L; var nC = 0L; var nT = 0L; var nF = 0L
        text.split(' ').foreach { word =>
          if (word.nonEmpty) {
            nW += 1
            nC += word.codePointCount(0, word.length)
            var hit = memo.get(word)
            if (hit == null) {
              val wb = new StringBuilder
              val (p, f) = tokenizeWord(vset, maxLen, word, wb)
              hit = (wb.toString, p, f)
              memo.put(word, hit)
            }
            if (docSb.nonEmpty) docSb.append(' ')
            docSb.append(hit._1)
            nT += hit._2
            nF += hit._3
          }
        }
        SubwordDoc(r.getLong(idIdx), nW, nC, nT, nF,
          TextHash.polyHash(UTF8String.fromString(docSb.toString), 31))
      }
    }.toDF()
  }
}
