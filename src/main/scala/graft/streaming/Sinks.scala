package graft.streaming

import org.apache.spark.sql.SparkSession

/** Guide §2.6 "overlap independent jobs": a micro-batch body whose
  * sinks are independent (each a `batch=<id>`-keyed idempotent
  * Overwrite) pays one scheduling round-trip per sink when it runs them
  * sequentially — on a 4-partition narrow batch that is most of the
  * batch's wall. Submitting them from a small driver thread pool lets
  * the next sink's tasks back-fill executors freed by the current
  * sink's tail.
  *
  * Retry contract unchanged: every action here must already be
  * idempotent under whole-batch retry (all callers pass batch-keyed
  * Overwrite writes). A failed sink fails the batch — all actions are
  * awaited and the first failure is rethrown, so foreachBatch sees the
  * same at-least-once semantics as the sequential form; on retry every
  * sink REPLACES its partial whether or not it succeeded the first
  * time. Shared cached frames are safe to consume concurrently: block
  * materialization is serialized per partition by the BlockManager's
  * per-block lock.
  */
private[graft] object Sinks {

  def inParallel(spark: SparkSession, actions: Seq[(String, () => Unit)]): Unit = {
    if (actions.lengthCompare(1) <= 0) {
      actions.foreach { case (name, act) => JobLabel.labeled(spark, name)(act()) }
      return
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(actions.length)
    try {
      val futures = actions.map { case (name, act) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = JobLabel.labeled(spark, name)(act())
        })
      }
      // await ALL (no early abandon: a half-cancelled sink would leave a
      // job running into the next batch), then surface the first failure
      val errs = futures.flatMap { f =>
        try { f.get(); None }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Some(Option(e.getCause).getOrElse(e))
          case scala.util.control.NonFatal(e) => Some(e)
        }
      }
      errs.headOption.foreach(throw _)
    } finally pool.shutdown()
  }
}
