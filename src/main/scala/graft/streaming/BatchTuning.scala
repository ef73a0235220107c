package graft.streaming

import org.apache.spark.sql.SparkSession

/** Micro-batch plan tuning for foreachBatch bodies.
  *
  * AQE executes every exchange as its own job (materialize → re-plan),
  * which is the right trade on data-sized queries and pure scheduling
  * overhead on a micro-batch touching a few thousand rows: a measured
  * 6-batch span-dedup replay runs 63 jobs with AQE on vs 34 with it
  * off, for ~13% wall time. Below their store-size cost switch the
  * incremental streams therefore run each batch with AQE off and a
  * narrow fixed shuffle width; above the switch they leave the session
  * untouched (big batches want AQE's coalescing and skew handling).
  *
  * The scope mutates SESSION conf and restores it in a finally — the
  * streams own their session for the duration of run() (driver
  * cadence), but a session shared with concurrently-planned batch
  * queries would observe the narrowed width for the batch's duration;
  * give such a workload its own SparkSession.
  */
private[streaming] object BatchTuning {

  private val Width = "spark.sql.shuffle.partitions"
  private val Aqe = "spark.sql.adaptive.enabled"

  def withNarrowShuffles[T](spark: SparkSession, narrow: Boolean,
                            partitions: Int = 4)(f: => T): T = {
    if (!narrow) f
    else {
      val aqe0 = spark.conf.get(Aqe)
      val w0 = spark.conf.get(Width)
      spark.conf.set(Aqe, "false")
      spark.conf.set(Width, partitions.toString)
      try f
      finally { spark.conf.set(Aqe, aqe0); spark.conf.set(Width, w0) }
    }
  }

  /** [[withNarrowShuffles]] over EVERY session a foreachBatch body plans
    * with. MicroBatchExecution hands the body a DataFrame bound to the
    * stream's CLONED SparkSession (isolated SQLConf), so frames derived
    * from the batch plan with the clone's conf and silently ignore a
    * narrow scope set on the outer session — measured on q134: the out
    * write alone ran as 9 AQE stage-materialization jobs because the
    * clone kept AQE on while the outer session was dutifully narrowed.
    * Tuning the distinct set (outer session for store-read-rooted plans,
    * batch session for batch-rooted ones) closes that hole; direct
    * processBatch calls (retry specs) pass the same session twice and
    * dedup to one.
    */
  def withNarrowShufflesOn[T](sessions: Seq[SparkSession], narrow: Boolean,
                              partitions: Int = 4)(f: => T): T =
    sessions.distinct.foldRight(() => f) { (s, g) =>
      () => withNarrowShuffles(s, narrow, partitions)(g())
    }()
}
