package graft.ops

import graft.functions.PolyHash.polyHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-span removal across documents at w-token-window
  * granularity — the substring-level third of the dedup family, between
  * doc-level exact dedup (q30) and within-doc repetition signals (q89):
  * a span of w consecutive tokens that appears anywhere earlier in the
  * corpus (by (doc_id, pos) order) is removed from the later document,
  * keeping the globally-first occurrence intact.
  *
  * Distributed shape: one shuffle of the w-gram table keyed on the
  * dual-base gram hash (the window that elects the first occurrence),
  * one small aggregate of duplicate starts per doc, and one corpus join
  * back on doc_id for reconstruction — gram construction and token
  * filtering are narrow per-row passes. The gram table is ~1 row per
  * corpus token ((doc_id, pos, pack) = 20 B hashed, never the gram
  * text), so the exchange is O(corpus tokens), the same scale class as
  * any tokenizing aggregate.
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
    withKept(docs, w)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        coalesce(size(col("starts")), lit(0)).cast("long").as("n_dup_spans"),
        coalesce(size(col("covered")), lit(0)).cast("long").as("n_removed"),
        polyHash(array_join(col("kept"), " ")).as("kept_hash"))
      .orderBy("doc_id")

  /** The reconstructed corpus itself: `(doc_id, text)` with every
    * duplicated span removed — the form a training pipeline feeds
    * downstream (chunking, packing, export).
    */
  def keptText(docs: DataFrame, w: Int): DataFrame =
    withKept(docs, w)
      .select(col("doc_id"), array_join(col("kept"), " ").as("text"))

  /** One ingestion batch deduped against the set of gram packs already
    * seen in earlier batches (incremental form — the `foreachBatch`
    * body of [[graft.streaming.SpanDedupStream]]): a batch gram is a
    * duplicate if its pack is in the store OR an earlier (doc_id, pos)
    * within the batch carries it. Returns the per-doc output (same
    * schema as [[dedupSpans]]) and the batch's first-seen packs to
    * append to the store. At scale the store is a pack-bucketed table
    * and the membership probe is the batch's one keyed join.
    */
  def dedupBatch(batch: DataFrame, storePacks: DataFrame,
                 w: Int): (DataFrame, DataFrame) = {
    val base = withKept(batch, w, Some(storePacks))
    val out = base
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        coalesce(size(col("starts")), lit(0)).cast("long").as("n_dup_spans"),
        coalesce(size(col("covered")), lit(0)).cast("long").as("n_removed"),
        polyHash(array_join(col("kept"), " ")).as("kept_hash"))
    val fresh = grams(batch, w)
      .join(storePacks.select(col("pack")), Seq("pack"), "left_anti")
      .select(col("pack")).distinct()
    (out, fresh)
  }

  private def grams(docs: DataFrame, w: Int): DataFrame =
    // (doc_id, pos, pack): one row per w-gram start — the GramPacks
    // kernel computes every dual-hash pack in one codegen pass over the
    // string (O(1) fold per token via prefix hashes), so the 12-byte
    // (pos, pack) pair is all that ever leaves the scan stage
    docs.select(col("doc_id"),
        posexplode_outer(graft.functions.ShingleKernel.gramPacks(col("text"), w))
          .as(Seq("pos", "pack")))
      .where(col("pack").isNotNull)

  private def withKept(docs: DataFrame, w: Int,
                       storePacks: Option[DataFrame] = None): DataFrame = {
    val toked = docs.select(col("doc_id"),
      filter(split(col("text"), " "), t => t =!= "").as("toks"))
    val g = grams(docs, w)
    // first occurrence per gram wins; every later one is a dup — and in
    // incremental mode any pack the store has seen is a dup outright
    val firstWins = Window.partitionBy("pack").orderBy("doc_id", "pos")
    val ranked = g.withColumn("rn", row_number().over(firstWins))
    val dups = storePacks match {
      case None => ranked.where(col("rn") > 1)
      case Some(store) => ranked
        .join(store.select(col("pack"), lit(true).as("seen")),
          Seq("pack"), "left")
        .where(col("rn") > 1 || col("seen").isNotNull)
    }
    val dupStarts = dups
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("starts"))
    toked.join(dupStarts, Seq("doc_id"), "left")
      .withColumn("covered", when(col("starts").isNotNull,
        array_sort(array_distinct(flatten(transform(col("starts"),
          s => sequence(s, s + lit(w - 1))))))))
      .withColumn("kept", when(col("covered").isNotNull,
        filter(col("toks"), (t, i) => !array_contains(col("covered"), i)))
        .otherwise(col("toks")))
  }
}
