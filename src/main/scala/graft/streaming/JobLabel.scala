package graft.streaming

import org.apache.spark.sql.SparkSession

/** Guide §1.5 job labeling: name each action a foreachBatch body runs so
  * the UI / profile traces attribute jobs to operations instead of the
  * anonymous `start at <file>` call site. Descriptions are thread-local;
  * the label is cleared after the action so unrelated jobs on the same
  * thread are not mislabeled.
  */
private[graft] object JobLabel {
  def labeled[T](spark: SparkSession, desc: String)(f: => T): T = {
    val sc = spark.sparkContext
    sc.setJobDescription(desc)
    try f finally sc.setJobDescription(null)
  }
}
