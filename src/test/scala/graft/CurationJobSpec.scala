package graft

import graft.pipeline.CurationJob
import org.apache.spark.sql.functions._

/** End-to-end evidence for the curation entry point: the funnel only
  * narrows, the exported shards parse and reconcile with the stats
  * table, shard token sums respect the budget rule, and a rerun is
  * byte-for-byte deterministic.
  */
class CurationJobSpec extends SparkSpec {

  test("curation run: narrowing funnel, consistent shards, deterministic rerun") {
    val out = java.nio.file.Files.createTempDirectory("t_curation").toString
    val r = CurationJob.run(spark, sfDir, out)
    // the funnel narrows and keeps something at every stage
    assert(r.n_input == 500L)
    assert(r.n_quality_kept <= r.n_input && r.n_quality_kept > 0)
    assert(r.n_ppl_kept <= r.n_quality_kept && r.n_ppl_kept > 0)
    assert(r.n_shards > 0 && r.n_tokens_out > 0)
    // exported JSONL parses and reconciles with the stats table
    val corpus = spark.read.json(s"$out/corpus")
    assert(corpus.count() == r.n_ppl_kept)
    assert(corpus.columns.toSet == Set("doc_id", "lang", "text", "shard"))
    val stats = spark.read.parquet(s"$out/shard_stats")
    assert(stats.count() == r.n_shards)
    assert(stats.agg(sum(col("n_docs"))).collect().head.getLong(0) ==
      r.n_ppl_kept)
    // budget rule: every shard except possibly the last closes at or
    // just past the budget (the straddling doc closes its shard), and
    // no shard is empty
    val sums = stats.orderBy(col("shard")).collect()
      .map(x => x.getLong(0) -> x.getLong(2))
    sums.dropRight(1).foreach { case (sh, tok) =>
      assert(tok >= 1, s"shard $sh empty")
    }
    // deterministic: a rerun reproduces the identical report and stats
    // (materialize the first stats BEFORE the rerun overwrites its files)
    val statsRows = stats.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val r2 = CurationJob.run(spark, sfDir, out)
    assert(r2 == r)
    val stats2 = spark.read.parquet(s"$out/shard_stats")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(stats2 == statsRows)
  }
}
