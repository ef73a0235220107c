package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the two-level quantizer's cell balance (q140's routed
  * kernel cost is Σ cell² — this prints the terms). Not part of the
  * driver surface.
  *
  * usage: graft.CellDiag [sfDir]
  */
object CellDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", graft.functions.VectorFunctions.squaredNorm(col("v")))
      .localCheckpoint()
    val n = e.count()
    val k = queries.SelectionOps.adaptiveK(n)
    println(s"[diag] n=$n k=$k k1=${queries.SelectionOps.superK(k)}")

    def report(tag: String, asg: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val cells = asg.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val stats = cells.agg(
        count(lit(1)).as("n_cells"), max(col("c")).as("max_c"),
        sum(col("c") * col("c")).as("sum_c2"),
        sum(col("c")).as("rows")).collect()(0)
      val secs = (System.nanoTime() - t0) / 1e9
      val top = cells.orderBy(col("c").desc).limit(10).collect()
        .map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
      println(f"[diag] $tag: cells=${stats.getLong(0)} max=${stats.getLong(1)} " +
        f"sum_c2=${stats.getLong(2)} rows=${stats.getLong(3)} asg_time=$secs%.1fs")
      println(s"[diag] $tag top10: $top")
    }

    report("top2", queries.SelectionOps.assignTwoLevelTop2(e, k))
    spark.stop()
  }
}
