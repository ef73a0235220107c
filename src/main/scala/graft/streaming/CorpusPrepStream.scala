package graft.streaming

import graft.queries.TrainingOps
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Continuous-ingestion form of the q98 corpus-prep composition (q104):
  * documents arrive as files and every micro-batch flows through the
  * same four stages — stateless quality gate, prefix-dedup, 32/24
  * chunking, hash split — with the two stateful pieces made
  * incremental:
  *
  *  - dedup state is a persistent store of seen 16-token prefixes
  *    (append-only, outside the streaming state store, like
  *    [[SpanDedupStream]]'s gram packs; at scale the store holds the
  *    prefix HASH);
  *  - the final per-(split, lang) stats accumulate as per-batch partial
  *    rows and fold with plain sums at read time — chunking never
  *    recomputes, and n_docs sums exactly because a doc chunks in
  *    exactly one batch.
  *
  * With arrival order staged to doc_id order, "first prefix wins by
  * arrival" equals the batch operator's keep-lowest-doc_id, so q104
  * shares q98's DuckDB oracle end to end.
  */
object CorpusPrepStream {

  private val pfxSchema = StructType(Seq(StructField("pfx", StringType)))

  /** Run the staged splits to completion (one micro-batch per file) and
    * return the folded per-(split, lang) stats, schema-identical to
    * q98's output.
    */
  def run(spark: SparkSession, inputDir: String, workDir: String): DataFrame = {
    val storeDir = s"$workDir/pfx_store"
    val partsDir = s"$workDir/partials"
    val stream = spark.readStream
      .schema(spark.read.parquet(inputDir).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inputDir/split_*.parquet")
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val gated = TrainingOps.withRowQuality(
            batch.select(col("doc_id").cast("long").as("doc_id"),
                         col("lang"), col("text")))
          .where(col("quality_pass") === 1)
          .select(col("doc_id"), col("lang"), col("text"))
          .withColumn("pfx",
            concat_ws(" ", slice(split(col("text"), " "), 1, 16)))
        // missing store = first batch; a read error on an EXISTING store
        // must fail the batch, not dedup against nothing
        val store = graft.pipeline.Load.readStoreIfExists(spark, storeDir)
          .getOrElse(spark.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), pfxSchema))
        // a prefix seen in an earlier batch loses outright; within the
        // batch the lowest doc_id keeps (arrival order = doc_id order)
        val kept = gated
          .join(store, Seq("pfx"), "left_anti")
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("pfx")).orderBy(col("doc_id"))))
          .where(col("rn") === 1)
          .select(col("doc_id"), col("lang"), col("text"))
        TrainingOps.chunkSplitStats(kept)
          .coalesce(1).write.mode(SaveMode.Append).parquet(partsDir)
        gated.select(col("pfx")).distinct()
          .join(store, Seq("pfx"), "left_anti")
          .coalesce(1).write.mode(SaveMode.Append).parquet(storeDir)
        ()
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(partsDir)
      .groupBy(col("split"), col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"),
           sum(col("n_chunks")).as("n_chunks"),
           sum(col("sum_ctoks")).as("sum_ctoks"))
      .orderBy(col("split"), col("lang"))
  }

  /** Stage + run in a fresh work dir: the q104 entry. */
  def runOn(spark: SparkSession, docs: DataFrame, nSplits: Int): DataFrame = {
    val workDir = java.nio.file.Files
      .createTempDirectory("q104_corpus_stream").toString
    SpanDedupStream.stageSplits(spark, docs, s"$workDir/input", nSplits)
    run(spark, s"$workDir/input", workDir)
  }
}
