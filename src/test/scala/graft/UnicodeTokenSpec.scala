package graft

import graft.functions.UnicodeTextOps
import org.apache.spark.unsafe.types.UTF8String

/** Unicode tokenization (q173, round-15 verdict #2): NFC composition
  * correctness, the decomposed-salt discrimination (skipping NFC must
  * change results), and ascii/unicode tokenizer-mode parity for the
  * q31 consumer on the pure-ASCII fixture. All non-ASCII codepoints in
  * this file are explicit \\u escapes so no editor can re-normalize
  * the source and silently neuter the assertions.
  */
class UnicodeTokenSpec extends SparkSpec {

  private def nfc(s: String): String =
    UnicodeTextOps.nfc(UTF8String.fromString(s)).toString

  private val eAcuteCombining = "cafe\u0301" // e + U+0301
  private val eAcuteComposed = "caf\u00e9" // precomposed U+00E9
  private val uUmlCombining = "u\u0308ber" // u + U+0308
  private val uUmlComposed = "\u00fcber" // precomposed U+00FC

  test("NFC composes decomposed sequences; ASCII is the identity fast path") {
    assert(nfc(eAcuteCombining) == eAcuteComposed)
    assert(nfc(uUmlCombining) == uUmlComposed)
    // already-composed and plain ASCII pass through unchanged
    assert(nfc(eAcuteComposed) == eAcuteComposed)
    val ascii = "the quick brown fox 42"
    assert(nfc(ascii) == ascii)
  }

  test("without NFC a combining mark splits the token; with NFC it does not") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val raw = Seq(uUmlCombining + " alles").toDF("text")
    val uni = raw.select(queries.TextOps.tokensCol(col("text"), "unicode"))
      .as[Seq[String]].head()
    assert(uni == Seq(uUmlComposed, "alles"))
    // the un-normalized regexp run shows why NFC must come first:
    // U+0308 is \p{M}, matched by neither class, so the run breaks
    val noNfc = raw.select(
      regexp_extract_all(col("text"), lit("[\\p{L}\\p{N}]+"), lit(0)))
      .as[Seq[String]].head()
    assert(noNfc == Seq("u", "ber", "alles"))
  }

  test("q31 consumer parity: ascii and unicode modes agree on the fixture") {
    val a = queries.TextOps.topTokens(spark, sfDir, "ascii").collect()
    val u = queries.TextOps.topTokens(spark, sfDir, "unicode").collect()
    assert(a.length == 25 && u.length == 25)
    a.zip(u).foreach { case (ra, ru) =>
      assert(ra.getString(0) == ru.getString(0) && ra.getLong(1) == ru.getLong(1),
        s"mode divergence: $ra vs $ru")
    }
  }

  test("q173 emits per-doc salted stats with the salt visible in the counts") {
    val out = queries.Registry.byName("q173_tokens_unicode")
      .run(spark, sfDir).collect()
    assert(out.nonEmpty)
    // every doc gained exactly 2 salt tokens over its space-split count
    val base = graft.Tables.documents(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").count(_.nonEmpty))
      .toMap
    out.foreach { r =>
      assert(r.getLong(1) == base(r.getLong(0)) + 2L,
        s"doc ${r.getLong(0)}: expected +2 salt tokens")
    }
  }
}
