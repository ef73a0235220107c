package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicated-span removal across documents at w-token-window
  * granularity — the substring-level third of the dedup family, between
  * doc-level exact dedup (q30) and within-doc repetition signals (q89):
  * a span of w consecutive tokens that appears anywhere earlier in the
  * corpus (by (doc_id, pos) order) is removed from the later document,
  * keeping the globally-first occurrence intact.
  *
  * Distributed shape: the first occurrence per gram is elected with a
  * partial-aggregable min(struct(doc_id, pos)) keyed on the dual-base
  * gram hash — map-side combine collapses hot grams (boilerplate
  * spans), where a row_number window would funnel every occurrence of
  * a hot gram through one task's sort. A doc's duplicate starts are
  * then the complement of its first-occurrence starts, so the
  * per-occurrence gram table never crosses the wire: the exchanges
  * carry only task-combined (pack, first) rows and tiny per-doc start
  * lists, plus the corpus join back on doc_id for reconstruction.
  * Gram construction and token filtering are narrow per-row passes.
  *
  * Dual-base polynomial hashes (31/131, cross-engine-replayable) make
  * gram identity collision-safe AND let DuckDB replay the whole
  * operator, including the removal: `kept_hash` pins the reconstructed
  * post-dedup text of every document.
  */
object SpanDedup {

  /** `docs(doc_id, text)` → one row per doc: token count, duplicated
    * span count, removed-token count, and the polynomial hash of the
    * reconstructed deduplicated text.
    */
  def dedupSpans(docs: DataFrame, w: Int): DataFrame =
    statsFrom(docs, firstStarts(firstOccurrences(docs, w, None)), w)
      .orderBy("doc_id")

  /** The reconstructed corpus itself: `(doc_id, text)` with every
    * duplicated span removed — the form a training pipeline feeds
    * downstream (chunking, packing, export).
    */
  def keptText(docs: DataFrame, w: Int): DataFrame =
    docs.join(firstStarts(firstOccurrences(docs, w, None)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        graft.functions.SpanKernel.spanKeptText(col("text"),
          coalesce(col("first_starts"), array().cast("array<int>")), w)
          .as("text"))

  /** One ingestion batch deduped against the set of gram packs already
    * seen in earlier batches (incremental form — the `foreachBatch`
    * body of [[graft.streaming.SpanDedupStream]]): a batch gram is a
    * duplicate if its pack is in the store OR an earlier (doc_id, pos)
    * within the batch carries it. Returns the per-doc output (same
    * schema as [[dedupSpans]]), the batch's first-seen packs to append
    * to the store, and a cleanup thunk to call after BOTH have been
    * materialized. The store delta IS the dedup's first-occurrence
    * election restricted to store-unseen packs (one row per fresh pack
    * by construction — no second distinct over gram occurrences), so
    * the election is computed once, cached, and shared by the two
    * sinks. At scale the store is a pack-bucketed table and the
    * membership probe is the batch's one keyed join.
    */
  def dedupBatch(batch: DataFrame, storePacks: DataFrame,
                 w: Int): (DataFrame, DataFrame, () => Unit) = {
    val firstsKept = firstOccurrences(batch, w, Some(storePacks)).cache()
    val out = statsFrom(batch, firstStarts(firstsKept), w)
    val fresh = firstsKept.select(col("pack"))
    (out, fresh, () => { firstsKept.unpersist(); () })
  }

  private[graft] def grams(docs: DataFrame, w: Int): DataFrame =
    // (doc_id, pos, pack): one row per w-gram start — the GramPacks
    // kernel computes every dual-hash pack in one codegen pass over the
    // string (O(1) fold per token via prefix hashes), so the 12-byte
    // (pos, pack) pair is all that ever leaves the scan stage
    docs.select(col("doc_id"),
        posexplode_outer(graft.functions.ShingleKernel.gramPacks(col("text"), w))
          .as(Seq("pos", "pack")))
      .where(col("pack").isNotNull)

  /** The first-occurrence election: one (pack, f=(doc_id, pos)) row per
    * gram pack, via a partial-aggregable min(struct) — NOT a row_number
    * window: a hot gram (boilerplate text) would funnel every
    * occurrence through one task's sort, while map-side combine
    * collapses it to one row per task. In incremental mode a pack the
    * store has seen is a dup outright, so its in-batch "first" loses
    * too (left-anti against the store).
    */
  private def firstOccurrences(docs: DataFrame, w: Int,
                               storePacks: Option[DataFrame]): DataFrame = {
    val firsts = grams(docs, w).groupBy("pack")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
    storePacks match {
      case None => firsts
      case Some(store) =>
        firsts.join(store.select(col("pack")), Seq("pack"), "left_anti")
    }
  }

  /** Per-doc first-occurrence start lists from the election: the tiny
    * cross-row information the reconstruction kernel needs.
    */
  private def firstStarts(firstsKept: DataFrame): DataFrame =
    firstsKept
      .groupBy(col("f.doc_id").as("doc_id"))
      .agg(collect_list(col("f.pos")).as("first_starts"))

  /** The reconstruction half: dup starts of a doc are the COMPLEMENT of
    * its first-occurrence starts among all its gram starts, so the
    * per-occurrence gram table never crosses the wire — the shuffles
    * carry only combined (pack, first) rows and tiny per-doc lists.
    * The per-row complement + interval-merge + rebuild + hash runs as
    * ONE codegen'd kernel pass ([[graft.functions.SpanKernel]]): the
    * earlier Catalyst higher-order-function pipeline had the same O(n)
    * semantics but paid a deep interpreted expression tree with
    * materialized intermediate arrays per row.
    */
  private def statsFrom(docs: DataFrame, firstStartsDf: DataFrame,
                        w: Int): DataFrame =
    docs.join(firstStartsDf, Seq("doc_id"), "left")
      .select(col("doc_id"),
        graft.functions.SpanKernel.spanStats(col("text"),
          coalesce(col("first_starts"), array().cast("array<int>")), w)
          .as("st"))
      .select(col("doc_id"),
        col("st").getItem(0).as("n_tok"),
        col("st").getItem(1).as("n_dup_spans"),
        col("st").getItem(2).as("n_removed"),
        col("st").getItem(3).as("kept_hash"))
}
