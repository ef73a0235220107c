package graft.ops

import org.apache.spark.sql.DataFrame

/** Block-level release for localCheckpoint'ed frames (round-10 advice).
  *
  * `Dataset.unpersist` is a no-op for these: it only clears
  * CacheManager entries, while localCheckpoint persists the UNDERLYING
  * RDD directly. That RDD is reachable as the `LogicalRDD` the
  * checkpointed frame wraps — unpersisting it frees the blocks
  * immediately instead of waiting for JVM GC + the periodic
  * ContextCleaner, which is what keeps iterative operators' live
  * storage O(1) rounds at the corpus rungs (a rank or frontier
  * snapshot is GBs at 16M+ nodes).
  *
  * The frame must never be read again — its lineage was truncated by
  * the checkpoint, so a released frame cannot recompute (Spark WARNs
  * accordingly; Bench/Verify mute that logger). Callers therefore
  * release only RETIRED snapshots: the previous round's frame once the
  * next round's checkpoint has materialized, never the frame they
  * return.
  */
object CheckpointBlocks {
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.DatasetBridge.analyzed(df) match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); ()
      case _ => ()
    }
}
