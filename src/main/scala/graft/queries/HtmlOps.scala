package graft.queries

import graft.Tables
import graft.ops.HtmlExtract
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HTML boilerplate extraction in the registry (round-15 verdict #1):
  * the stage that turns a web crawl into a clean-text corpus — the one
  * the reference never needs because it ingests pre-extracted CSV
  * (reference `src/data_extract.py:62`), and the first stage every real
  * 100 TB LLM-corpus user runs.
  *
  * Both queries render each fixture doc into a deterministic HTML page
  * (planted nav/header/script/link-farm/footer boilerplate around the
  * real text, [[graft.ops.HtmlExtractOps.wrap]]) and run the tag-walk +
  * length/link-density extractor back over it — wholly inside
  * whole-stage codegen, zero shuffle until the final per-doc order/agg.
  * The DuckDB oracles replay page generation AND the classification
  * rule from the raw text, so a defect anywhere — tag walk, pruning,
  * codepoint counts, density arithmetic, block order — breaks the hash.
  */
object HtmlOps {

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        coalesce(col("text"), lit("")).as("text"))

  /** Shared oracle prefix: replay wrapper generation as block rows.
    * Candidate blocks (everything the extractor classifies — pruned
    * nav/footer/script subtrees never become candidates): the h1 page
    * header, one block per 12-token paragraph, and the related-links
    * div whose anchor codepoints count as link chars.
    */
  private val BlocksSql: String =
    """WITH toks AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
      |              FROM documents),
      |paras AS (SELECT doc_id, i,
      |            array_to_string(list_slice(t, i*12 + 1,
      |              least((i+1)*12, len(t))), ' ') AS btext
      |          FROM toks, unnest(range(0, (len(t) + 11) // 12)) AS u(i)),
      |rel AS (SELECT doc_id,
      |          'related: ' || array_to_string(list_transform(
      |            range(0, 2 + doc_id % 3),
      |            j -> 'doc-' || ((doc_id + j) % 1000)), ' ') AS btext,
      |          CAST(list_sum(list_transform(range(0, 2 + doc_id % 3),
      |            j -> length('doc-' || ((doc_id + j) % 1000)))) AS BIGINT) AS lc
      |        FROM documents),
      |blocks AS (
      |  SELECT doc_id, 0 AS ord, 'document ' || doc_id AS btext,
      |         CAST(0 AS BIGINT) AS lc FROM documents
      |  UNION ALL SELECT doc_id, 1 + i, btext, CAST(0 AS BIGINT) FROM paras
      |  UNION ALL SELECT doc_id, 2147483647, btext, lc FROM rel),
      |nz AS (SELECT doc_id, ord, btext, lc,
      |         CAST(length(btext) AS BIGINT) AS blen,
      |         (length(btext) >= 25 AND lc * 10 < length(btext) * 3) AS keep
      |       FROM blocks WHERE length(btext) > 0)""".stripMargin

  val defs: Seq[Q] = Seq(
    // ---- E4+: boilerplate extraction features, fully oracle-gated -------
    Q(
      "q172_html_extract",
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"),
            HtmlExtract.htmlMainStats(
              HtmlExtract.htmlWrap(col("doc_id"), col("text"))).as("st"))
          .select(col("doc_id"),
            col("st.n_blocks").as("n_blocks"),
            col("st.n_kept").as("n_kept"),
            col("st.kept_chars").as("kept_chars"),
            col("st.link_chars").as("link_chars"),
            md5(col("st.main_text")).as("kept_md5"))
          .orderBy(col("doc_id")),
      Some(BlocksSql + "\n" +
        """SELECT doc_id,
          |       CAST(count(*) AS BIGINT) AS n_blocks,
          |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
          |       CAST(coalesce(sum(CASE WHEN keep THEN blen END), 0) AS BIGINT) AS kept_chars,
          |       CAST(sum(lc) AS BIGINT) AS link_chars,
          |       md5(string_agg(CASE WHEN keep THEN btext END, chr(10)
          |                      ORDER BY ord)) AS kept_md5
          |FROM nz GROUP BY doc_id
          |ORDER BY doc_id""".stripMargin)),

    // ---- the extraction composed IN FRONT of the q98 corpus-prep chain --
    // wrap → extract main text → quality gate → prefix dedup → chunk →
    // split → per-(split, lang) stats: the full web-crawl-to-training-
    // corpus funnel under one oracle. The extractor feeds the chain the
    // kept paragraphs joined by spaces; docs whose content dies in
    // extraction (nothing survives the density rule) enter as empty
    // text and fall at the quality gate, exactly as the oracle replays.
    Q(
      "q175_html_corpus_prep",
      (s, d) => {
        val extracted = docs(s, d)
          .select(col("doc_id"), col("lang"),
            HtmlExtract.htmlMainStats(
              HtmlExtract.htmlWrap(col("doc_id"), col("text")))
              .getField("main_text").as("mt"))
          .select(col("doc_id"), col("lang"),
            coalesce(translate(col("mt"), "\n", " "), lit("")).as("text"))
        val gated = TrainingOps.withRowQuality(extracted)
          .where(col("quality_pass") === 1)
          .select(col("doc_id"), col("lang"), col("text"))
        val deduped = gated
          .withColumn("pfx",
            concat_ws(" ", slice(split(col("text"), " "), 1, 16)))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("pfx")).orderBy(col("doc_id"))))
          .where(col("rn") === 1)
          .select(col("doc_id"), col("lang"), col("text"))
        TrainingOps.chunkSplitStats(deduped)
          .orderBy(col("split"), col("lang"))
      },
      // replay extraction (kept paragraphs joined by ' ') as the doc
      // source, then the verbatim q98 oracle chain over it. h1 and the
      // related div never survive (the header is < 25 chars at fixture
      // ids; the link farm always exceeds the density bound), so the
      // rebuilt text is exactly the kept 12-token paragraphs in order.
      Some(TrainingOps.corpusPrepSqlFrom(
        """toks0 AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS t
          |           FROM documents),
          |paras0 AS (SELECT doc_id, i,
          |             array_to_string(list_slice(t, i*12 + 1,
          |               least((i+1)*12, len(t))), ' ') AS btext
          |           FROM toks0, unnest(range(0, (len(t) + 11) // 12)) AS u(i)),
          |keptp AS (SELECT doc_id,
          |            array_to_string(list(btext ORDER BY i), ' ') AS text
          |          FROM paras0 WHERE length(btext) >= 25 GROUP BY doc_id),
          |htmldocs AS (SELECT d0.doc_id, d0.lang, coalesce(k.text, '') AS text
          |             FROM documents d0 LEFT JOIN keptp k
          |               ON d0.doc_id = k.doc_id),
          |""".stripMargin,
        "htmldocs")))
  )
}
