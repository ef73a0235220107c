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

  /** Stage `docs` as `nSplits` doc_id-range parquet files under
    * `inputDir`, named and modification-timestamped in range order so
    * the file source replays them oldest-first (it orders by mod time):
    * arrival order = doc_id order.
    */
  def stageSplits(spark: SparkSession, docs: DataFrame, inputDir: String,
                  nSplits: Int): Unit = {
    val bound = docs.agg(max(col("doc_id"))).collect().head.getLong(0) + 1
    val span = math.max(1L, (bound + nSplits - 1) / nSplits)
    new java.io.File(inputDir).mkdirs()
    // one pass: hive-partition on the split id, then lift each part
    // file out as an ordered, timestamped arrival
    val tmp = s"$inputDir/_stage"
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
    */
  def run(spark: SparkSession, inputDir: String, workDir: String,
          w: Int): DataFrame = {
    val storeDir = s"$workDir/gram_store"
    val outDir = s"$workDir/out"
    val stream = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inputDir/split_*.parquet")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // missing store = first batch; a read error on an EXISTING store
        // must fail the batch, not dedup against nothing
        val store = graft.pipeline.Load.readStoreIfExists(spark, storeDir)
          .getOrElse(spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), packSchema))
        val (out, fresh) = SpanDedup.dedupBatch(batch, store, w)
        // materialize the doc output, then append the store delta; the
        // delta job's scan list over the store is fixed at planning, so
        // appending to the directory it reads is safe
        out.coalesce(1).write.mode(SaveMode.Append).parquet(outDir)
        fresh.coalesce(1).write.mode(SaveMode.Append).parquet(storeDir)
        ()
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir).orderBy("doc_id")
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
