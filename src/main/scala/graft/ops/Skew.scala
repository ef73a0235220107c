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
