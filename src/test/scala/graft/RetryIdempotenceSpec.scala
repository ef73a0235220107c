package graft

import graft.pipeline.Load
import graft.streaming.{CorpusPrepStream, MinHashDedupStream, SpanDedupStream}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** foreachBatch is at-least-once: a micro-batch that fails AFTER its
  * store partial landed re-runs with the same batchId. The round-5
  * advisory found the read-your-own-partial hole: the retry's store
  * probe saw the first attempt's rows, inverting dedup verdicts (span,
  * corpus — every gram/prefix anti-joins away) or doubling rescore
  * counts into false duplicates (minhash). These specs drive each
  * stream's processBatch TWICE with the same batchId — the worst-case
  * retry, first attempt fully succeeded — and require bit-identical
  * outputs and store state, plus the crash-safety contract of the
  * cross-batch consolidator.
  */
class RetryIdempotenceSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case a: collection.Seq[_] => a.toList
      case x => x
    }.toList).toSeq.sortBy(_.toString)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("span stream: retried batch recomputes identical partials") {
    // batch 0: six 24-token docs; batch 1: two docs repeating batch-0
    // token runs (real cross-batch dup spans) + two fresh docs
    val mk = (seed: Int) =>
      (0 until 24).map(j => s"t${(seed * 7 + j * j) % 19}").mkString(" ")
    val b0 = (0L until 6L).map(i => (i, mk(i.toInt))).toDF("doc_id", "text")
    val b1 = Seq(6L -> mk(1), 7L -> mk(3),
      8L -> (0 until 24).map(j => s"u$j").mkString(" "),
      9L -> (0 until 24).map(j => s"v$j").mkString(" "))
      .toDF("doc_id", "text")
    val workDir = tmp("graft_retry_span")
    SpanDedupStream.processBatch(spark, b0, 0L, workDir, w = 4,
      nBuckets = 8, compactEvery = 0)
    SpanDedupStream.processBatch(spark, b1, 1L, workDir, w = 4,
      nBuckets = 8, compactEvery = 0)
    val out1 = rows(spark.read.parquet(s"$workDir/out/batch=1"))
    val store1 = rows(spark.read.parquet(s"$workDir/gram_store"))
    // the scenario is only meaningful if batch 1 mixes dup and fresh
    assert(out1.exists(r => r(2).asInstanceOf[Long] > 0), out1.toString)
    assert(out1.exists(r => r(2).asInstanceOf[Long] == 0), out1.toString)
    // retry after complete first attempt (store partial already landed)
    SpanDedupStream.processBatch(spark, b1, 1L, workDir, w = 4,
      nBuckets = 8, compactEvery = 0)
    assert(rows(spark.read.parquet(s"$workDir/out/batch=1")) == out1)
    assert(rows(spark.read.parquet(s"$workDir/gram_store")) == store1)
  }

  test("minhash stream: retried batch keeps its verdicts (no doubled rescore)") {
    // batch 1 holds a same-batch pair sharing a long prefix: jac lands
    // between the dup threshold (0.8) and the doubled-count flip point
    // (~0.57), so a retry that read its own pack partial back would
    // flip doc 11 from kept to duplicate
    val shared = (0 until 32).map(j => s"w${j * 3 % 23}").mkString(" ")
    val b0 = Seq(
      0L -> ((0 until 25).map(j => s"a$j").mkString(" ")),
      1L -> ((0 until 25).map(j => s"b$j").mkString(" "))).toDF("doc_id", "text")
    val b1 = Seq(
      10L -> (shared + " x1 x2 x3 x4 x5"),
      11L -> (shared + " y1 y2 y3 y4 y5"),
      12L -> ((0 until 25).map(j => s"c$j").mkString(" "))).toDF("doc_id", "text")
    val workDir = tmp("graft_retry_minhash")
    MinHashDedupStream.processBatch(spark, b0, 0L, workDir, 16, Long.MaxValue)
    MinHashDedupStream.processBatch(spark, b1, 1L, workDir, 16, Long.MaxValue)
    val out1 = rows(spark.read.parquet(s"$workDir/out/batch=1"))
    // clean run: nothing in batch 1 rescores at >= 0.8 — all kept
    assert(out1.forall(r => r(2).asInstanceOf[Int] == 1), out1.toString)
    val packs1 = rows(spark.read.parquet(s"$workDir/pack_store"))
    val bands1 = rows(spark.read.parquet(s"$workDir/band_store"))
    MinHashDedupStream.processBatch(spark, b1, 1L, workDir, 16, Long.MaxValue)
    assert(rows(spark.read.parquet(s"$workDir/out/batch=1")) == out1)
    assert(rows(spark.read.parquet(s"$workDir/pack_store")) == packs1)
    assert(rows(spark.read.parquet(s"$workDir/band_store")) == bands1)
  }

  test("minhash CC fold: retried batch rebuilds the identical label snapshot") {
    // batch 1 brings a cross-batch near-dup pair (doc 10 ~ doc 0) and a
    // same-batch pair (11 ~ 12); the retried fold must read the batch-0
    // snapshot (not its own) and rewrite batch=1 bit-identically
    val shared = (0 until 32).map(j => s"w${j * 3 % 23}").mkString(" ")
    val b0 = Seq(
      0L -> (shared + " p1 p2"),
      1L -> ((0 until 25).map(j => s"b$j").mkString(" "))).toDF("doc_id", "text")
    val b1 = Seq(
      10L -> (shared + " p1 p3"),
      11L -> (shared.replace("w", "v") + " q1"),
      12L -> (shared.replace("w", "v") + " q2")).toDF("doc_id", "text")
    val workDir = tmp("graft_retry_cc")
    MinHashDedupStream.processBatch(spark, b0, 0L, workDir, 16,
      Long.MaxValue, foldCc = true)
    MinHashDedupStream.processBatch(spark, b1, 1L, workDir, 16,
      Long.MaxValue, foldCc = true)
    val labels1 = rows(spark.read.parquet(s"$workDir/labels/batch=1"))
    val pairs1 = rows(spark.read.parquet(s"$workDir/pair_store"))
    // the planted components actually formed: 10 -> 0, 12 -> 11
    val got = spark.read.parquet(s"$workDir/labels/batch=1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(10L) == 0L && got(0L) == 0L, got.toString)
    assert(got(12L) == 11L && got(11L) == 11L, got.toString)
    MinHashDedupStream.processBatch(spark, b1, 1L, workDir, 16,
      Long.MaxValue, foldCc = true)
    assert(rows(spark.read.parquet(s"$workDir/labels/batch=1")) == labels1)
    assert(rows(spark.read.parquet(s"$workDir/pair_store")) == pairs1)
  }

  test("corpus stream: retried batch recomputes identical stats partial") {
    // quality gate: >= 30 words, mean word length 3-5, >= 2 stopwords
    val text = "the of " + (0 until 38).map(j => s"tok$j").mkString(" ")
    val b0 = Seq((0L, "en", text), (1L, "en", text + " tail"))
      .toDF("doc_id", "lang", "text")
    // doc 2 repeats doc 0's 16-token prefix (cross-batch dup), doc 3 fresh
    val b1 = Seq((2L, "en", text), (3L, "de", "the of " + (40 until 78)
      .map(j => s"tok$j").mkString(" "))).toDF("doc_id", "lang", "text")
    val workDir = tmp("graft_retry_corpus")
    CorpusPrepStream.processBatch(spark, b0, 0L, workDir, 16, 0)
    CorpusPrepStream.processBatch(spark, b1, 1L, workDir, 16, 0)
    val parts1 = rows(spark.read.parquet(s"$workDir/partials/batch=1"))
    val store1 = rows(spark.read.parquet(s"$workDir/pfx_store"))
    // doc 2 deduped away: batch 1 contributes only the de split rows
    assert(parts1.nonEmpty && parts1.forall(r => r.contains("de")),
      parts1.toString)
    CorpusPrepStream.processBatch(spark, b1, 1L, workDir, 16, 0)
    assert(rows(spark.read.parquet(s"$workDir/partials/batch=1")) == parts1)
    assert(rows(spark.read.parquet(s"$workDir/pfx_store")) == store1)
  }

  test("consolidateBatchStore: merges pre-batch partitions, replay-safe") {
    val dir = tmp("graft_consolidate") + "/store"
    for (b <- 0L until 5L) {
      Load.writeBatchPartial(
        spark.range(b * 100, b * 100 + 50).select(col("id").as("pack"))
          .withColumn("bucket", pmod(col("pack"), lit(8L)).cast("int"))
          .repartition(col("bucket")),
        dir, b, Seq("bucket"))
    }
    val members = rows(spark.read.parquet(dir).select("pack"))
    // consolidation inside batch 4's callback: merge everything < 4
    Load.consolidateBatchStore(spark, dir, 4L)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted.toSeq
    assert(dirs == Seq("batch=-4", "batch=4"), dirs.toString)
    assert(rows(spark.read.parquet(dir).select("pack")) == members)
    // the current batch's partition must stay excludable after merge
    val preBatch = (0L until 4L).flatMap(b => b * 100 until b * 100 + 50)
    assert(rows(Load.readStoreExcludingBatch(spark, dir, 4L).get
      .select("pack")) ==
      rows(preBatch.toDF("pack")))
    // a retried completion (marker exists, originals partly gone) is a
    // no-op that preserves the set
    Load.consolidateBatchStore(spark, dir, 4L)
    assert(rows(spark.read.parquet(dir).select("pack")) == members)
    // bucket pruning still works on the consolidated layout
    val pruned = Load.readBucketed(spark, dir, Seq(3), 8).get
    assert(rows(pruned.select("pack")) ==
      members.filter(r => r.head.asInstanceOf[Long] % 8 == 3))
  }

  test("readStoreExcludingBatch returns exactly the pre-batch state") {
    val dir = tmp("graft_exclude") + "/store"
    for (b <- 0L until 3L)
      Load.writeBatchPartial(Seq((b, s"v$b")).toDF("k", "v"), dir, b)
    val pre = rows(Load.readStoreExcludingBatch(spark, dir, 2L).get
      .select("k", "v"))
    assert(pre == rows(Seq((0L, "v0"), (1L, "v1")).toDF("k", "v")))
    assert(Load.readStoreExcludingBatch(spark, s"$dir/absent", 0L).isEmpty)
  }
}
