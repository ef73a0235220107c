package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key mitigation for aggregations (the manual complement to AQE's
  * skew-join splitting, which only covers joins).
  *
  * A groupBy on a skewed key sends every row of the hot key to one
  * reducer; salting splits each key into `saltBuckets` sub-keys for a
  * partial aggregate, then combines partials — two small shuffles
  * instead of one stuck straggler. Worth it only for algebraic
  * aggregates (sum/count/min/max) whose partials merge losslessly.
  *
  * WHEN SALTING IS ACTUALLY NEEDED (don't salt every skewed groupBy):
  * for algebraic aggregates Spark's map-side partial aggregation
  * already collapses each map partition to at most one row per key
  * before the shuffle, so a hot key costs each reducer at most
  * `numMapPartitions` tiny partial rows — skew is absorbed for free.
  * Salting only wins when that defense is off or overwhelmed:
  * (1) the per-task partial hash map exceeds
  * `spark.sql.aggregate.partialAggregate.maxMemory`-style limits and
  * spills/falls back to sort because the grouping cardinality is huge
  * (high-cardinality PLUS a hot key — the partial map evicts before the
  * hot key re-collapses); (2) partial aggregation is disabled or
  * impossible (`spark.sql.aggregate.partialaggregate.skip.enabled`
  * rewrites, distinct-rewritten plans whose first shuffle keys on the
  * raw value, collect_list-style non-condensing aggregates); or
  * (3) the aggregate is algebraic but its partial state is wide enough
  * that one-row-per-key-per-mapper is itself the bottleneck. Outside
  * those cases the plain groupBy compiles to the same two-phase plan
  * with one fewer shuffle — prefer it. Any extension of this helper
  * must keep the aggregates mergeable-partial (the salt assignment is
  * nondeterministic per row, so non-algebraic aggregates — first,
  * collect_list order, exact percentiles — would silently change
  * results), and the salt column must never leak into output.
  */
object Skew {

  /** Salted equivalent of
    * `df.groupBy(key).agg(count(*) as n, sum(valueCol) as total)`.
    */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
                     saltBuckets: Int = 16): DataFrame =
    df
      .withColumn("__salt", pmod(spark_partition_id()
        + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__sum"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__sum")).as("total"))
}
