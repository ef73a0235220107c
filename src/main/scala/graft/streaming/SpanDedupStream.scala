package graft.streaming

import graft.ops.SpanDedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Continuous-ingestion form of span dedup (q101): documents arrive as
  * files, and each micro-batch is deduplicated against everything seen
  * before it — earlier batches through a persistent store of gram
  * packs, earlier docs within the batch through the same first-wins
  * window the batch operator uses. The store is the stream's state,
  * but kept OUTSIDE the state store on purpose: gram identity is
  * append-only and unbounded, exactly what a pack-keyed parquet (at
  * scale: bucketed) table is for, while per-key streaming state would
  * checkpoint the whole gram universe every batch.
  *
  * When arrival order matches doc_id order, the incremental output is
  * row-for-row the batch operator's output — q101 shares q100's DuckDB
  * oracle on that guarantee.
  */
object SpanDedupStream {

  private val packSchema = StructType(Seq(StructField("pack", LongType)))

  /** Store size above which a batch pays the bucket-list job to
    * partition-prune its probe; below it a full scan is cheaper.
    */
  private val PruneThresholdBytes = 64L * 1024 * 1024

  /** Stage `docs` as `nSplits` doc_id-range parquet files under
    * `inputDir`, named and modification-timestamped in range order so
    * the file source replays them oldest-first (it orders by mod time):
    * arrival order = doc_id order.
    */
  def stageSplits(spark: SparkSession, docs: DataFrame, inputDir: String,
                  nSplits: Int): Unit = {
    // Cost-switched staging plan: when the frame to stage is itself a
    // narrow scan (the small-fixture case — one or two input splits),
    // plan it like a micro batch (AQE off, narrow width — each AQE
    // exchange materialization is an extra scheduling round-trip on a
    // table this size). A WIDE input keeps the session's AQE planning:
    // narrowing it funneled a 100x rung's staged table through 4
    // AQE-off partitions (measured at sf10: q125 35 -> 51 s before
    // this switch). The hash-repartition on `split` keeps each split
    // value wholly inside one task at any width, so the
    // one-file-per-split layout the replay order depends on is
    // width-independent.
    val width = math.max(4, nSplits)
    val narrow = docs.rdd.getNumPartitions <= width
    BatchTuning.withNarrowShuffles(spark, narrow = narrow,
      partitions = width) {
      stageSplitsInner(spark, docs, inputDir, nSplits)
    }
  }

  private def stageSplitsInner(spark: SparkSession, docs: DataFrame,
                               inputDir: String, nSplits: Int): Unit = {
    val boundRow = docs.agg(max(col("doc_id"))).collect().head
    new java.io.File(inputDir).mkdirs()
    val tmp = s"$inputDir/_stage"
    if (boundRow.isNullAt(0)) {
      // EMPTY corpus (r13 degenerate sweep): max(doc_id) is null, and a
      // partitionBy write would stage zero files — the file source then
      // has nothing to infer a schema from and every stream twin dies.
      // Stage ONE zero-row file with the real schema instead: the
      // stream runs one empty micro-batch and its accumulated output
      // is the batch operator's empty result.
      docs.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      val file = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"staging wrote no parquet part file under $tmp"))
      val dest = new java.io.File(inputDir, "split_000.parquet")
      java.nio.file.Files.move(file.toPath, dest.toPath)
      require(dest.setLastModified(1000000L),
        s"setLastModified failed on $dest")
      deleteRecursively(new java.io.File(tmp))
      return
    }
    val bound = boundRow.getLong(0) + 1
    val span = math.max(1L, (bound + nSplits - 1) / nSplits)
    // one pass: hive-partition on the split id, then lift each part
    // file out as an ordered, timestamped arrival
    docs.withColumn("split", (col("doc_id") / span).cast("int"))
      .repartition(col("split"))
      .write.mode(SaveMode.Overwrite).partitionBy("split").parquet(tmp)
    for (i <- 0 until nSplits) {
      val dir = new java.io.File(s"$tmp/split=$i")
      if (dir.isDirectory) {
        val file = dir.listFiles().find(_.getName.endsWith(".parquet"))
          .getOrElse(throw new IllegalStateException(
            s"staging wrote no parquet part file under $dir"))
        val dest = new java.io.File(inputDir, f"split_$i%03d.parquet")
        java.nio.file.Files.move(file.toPath, dest.toPath)
        // distinct ascending timestamps pin the replay order (the file
        // source sorts by mod time); correctness of the stream=batch
        // guarantee depends on it, so a failed/coarse-grained mtime set
        // must be loud, not a silent reorder
        require(dest.setLastModified(1000000L + i * 60000L),
          s"setLastModified failed on $dest: file-source replay order " +
            "would be undefined")
      }
    }
    deleteRecursively(new java.io.File(tmp))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  /** Run the incremental dedup over the staged splits to completion
    * (one micro-batch per file) and return the accumulated per-doc
    * output, schema-identical to `SpanDedup.dedupSpans`.
    *
    * Store layout (the 100 TB shape): gram packs live in a Hive-style
    * `bucket=<pack mod nBuckets>` directory tree. Each micro-batch
    * (1) derives the distinct buckets its grams touch, (2) reads the
    * store WITH a partition filter on those buckets — directory-level
    * pruning, so the anti-join scans only matching store buckets, never
    * full history — and (3) appends its first-seen packs partitioned by
    * bucket with one task per bucket (natural parallelism; no
    * one-task `coalesce(1)` funnel). Every `compactEvery` batches the
    * accumulated per-bucket small files are rewritten in place
    * ([[graft.pipeline.Load.compactPartitioned]] skips already-compact
    * buckets), so scan task counts track data size, not append count.
    *
    * Restart safety: BOTH sinks are keyed on batchId (`batch=<id>`
    * Overwrite partials, Load.writeBatchPartial) and the store read
    * EXCLUDES the current batch's own partition
    * (Load.readStoreExcludingBatch). The exclusion is what makes a
    * retry recompute the same answer: foreachBatch is at-least-once,
    * and a batch retried after its store delta landed would otherwise
    * dedup against a store already holding its own packs — every gram
    * anti-joins away, and the recomputed (wrong, all-duplicate) doc
    * stats would REPLACE the correct ones in the batch-keyed out
    * partial. With the exclusion, a retry sees exactly the pre-batch
    * state, recomputes bit-identical outputs, and its two Overwrites
    * replace equal data with equal data. Cross-batch consolidation
    * (Load.consolidateBatchStore) replaces the per-leaf compactor: it
    * merges only partitions strictly BEFORE the current batch, so it
    * can never fold the current batch's delta into an unexcludable
    * directory.
    */
  def run(spark: SparkSession, inputDir: String, workDir: String,
          w: Int, nBuckets: Int = 16, compactEvery: Int = 8): DataFrame = {
    val stream = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inputDir/split_*.parquet")
    val q = stream.writeStream
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        processBatch(spark, batch0, batchId, workDir, w, nBuckets,
          compactEvery)
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$workDir/out")
      .select(col("doc_id"), col("n_tok"), col("n_dup_spans"),
        col("n_removed"), col("kept_hash"))
      .orderBy("doc_id")
  }

  /** One micro-batch of the incremental dedup — the foreachBatch body,
    * exposed so the retry contract is directly testable: calling this
    * twice with the same batchId (the at-least-once scenario where the
    * first attempt completed its store append before failing) must
    * produce bit-identical out and store partials.
    */
  private[graft] def processBatch(spark: SparkSession, batch0: DataFrame,
                                  batchId: Long, workDir: String, w: Int,
                                  nBuckets: Int,
                                  compactEvery: Int): Unit = {
    val storeDir = s"$workDir/gram_store"
    val outDir = s"$workDir/out"
    val bucketOf = pmod(col("pack"), lit(nBuckets.toLong)).cast("int")
    // three consumers scan the batch (bucket list, dedup, delta):
    // cache it for the micro-batch's lifetime
    val batch = batch0.cache()
    // missing store = first batch (nothing to prune, skip the
    // bucket-list job); a read error on an EXISTING store must fail
    // the batch, not dedup against nothing. The read excludes the
    // batch's own `batch=` partition so an at-least-once retry
    // dedups against the pre-batch state. The bucket list — the
    // partition-prune filter for the store probe — is the batch's
    // grams' distinct hash buckets: bounded by nBuckets, a tiny
    // driver-side list, not data. Cost-based: below the size
    // threshold a full scan beats paying an extra job for the list.
    val big = graft.pipeline.Load.storeBytes(spark, storeDir) >=
      PruneThresholdBytes
    // below the switch, plan the whole batch with narrow shuffles and
    // AQE off — micro-batch data never needs runtime re-planning, and
    // each AQE exchange materialization is a whole extra job
    BatchTuning.withNarrowShufflesOn(Seq(spark, batch0.sparkSession), narrow = !big) {
    val store = graft.pipeline.Load
      .readStoreExcludingBatch(spark, storeDir, batchId)
      .map { s =>
        val pruned = if (!big) s else {
          val batchBuckets = SpanDedup.grams(batch, w)
            .select(bucketOf.as("bucket")).distinct()
            .collect().map(_.getInt(0)).toSeq
          graft.pipeline.Load.pruneBuckets(s, batchBuckets, nBuckets)
        }
        pruned.select(col("pack"))
      }
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), packSchema))
    val (out, fresh, done) = SpanDedup.dedupBatch(batch, store, w)
    // the doc output and the batch-keyed store delta are independent
    // batch-keyed Overwrite partials sharing one cached election
    // (dedupBatch's firstsKept) — overlap them on a driver pool
    // (Sinks.inParallel, guide §2.6); one writer per bucket for the
    // delta (under the narrow width the repartition is a 4-task
    // shuffle, and it is what bounds store files per batch)
    Sinks.inParallel(spark, Seq(
      s"b$batchId: out write" -> (() =>
        graft.pipeline.Load.writeBatchPartial(out, outDir, batchId)),
      s"b$batchId: gram store write" -> (() =>
        graft.pipeline.Load.writeBatchPartial(
          fresh.withColumn("bucket", bucketOf).repartition(col("bucket")),
          storeDir, batchId, Seq("bucket")))))
    // consolidation cadence is also cost-gated: rewriting a tiny store
    // every few batches was pure overhead; it now waits for byte-scale
    // OR file-count fragmentation (a crashed consolidation's leftover
    // duplicates are membership-invisible and get swept by whichever
    // trigger fires next)
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0 &&
        (big || graft.pipeline.Load.storeFileCount(spark, storeDir) >
          4 * nBuckets))
      graft.pipeline.Load.consolidateBatchStore(spark, storeDir, batchId)
    done()
    batch.unpersist()
    ()
    }
  }

  /** Stage + run in a fresh work dir: the q101 entry. */
  def runOn(spark: SparkSession, docs: DataFrame, w: Int,
            nSplits: Int): DataFrame = {
    val workDir = java.nio.file.Files
      .createTempDirectory("q101_span_stream").toString
    stageSplits(spark, docs, s"$workDir/input", nSplits)
    run(spark, s"$workDir/input", workDir, w)
  }
}
