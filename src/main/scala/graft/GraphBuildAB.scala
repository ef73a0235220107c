package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** In-JVM A/B of the PageRank build paths (round-13 forensics): the r13
  * `ranksSymmetric`/`personalizedSymmetric` builders (deg/Σw from the
  * half-sized pair frame, no endpoint distinct) against the r12
  * `ranks`/`personalized` build over the symmetrized edge list — same
  * session, alternating order, so box drift between standalone runs
  * cannot masquerade as a code regression. Iteration cores are shared
  * code; only the build differs. Usage: `GraphBuildAB <sfDir> [reps]`.
  */
object GraphBuildAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator
      .setLevel("org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

    def run(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[ab] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s (rows=$n)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    // the q130 shape, minus the supplier join-back (identical both arms)
    def pairsDf(gs: SparkSession, stage: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame) =
      stage(Tables.lineitem(gs, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(gs, sfDir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
        .distinct())
    (1 to reps).foreach { r =>
      run(s"rep$r NEW ranksSymmetric") {
        queries.GraphOps.withFactScaledShuffle(spark, sfDir) { (gs, stage, big) =>
          graft.ops.PageRank.ranksSymmetric(
            pairsDf(gs, stage).select(col("c").as("a"), col("sp").as("b")),
            8, columnarEdgeCache = big)
        }.count()
      }
      run(s"rep$r OLD ranks(symmetrized)") {
        queries.GraphOps.withFactScaledShuffle(spark, sfDir) { (gs, stage, big) =>
          val p = pairsDf(gs, stage)
          graft.ops.PageRank.ranks(
            p.select(col("c").as("src"), col("sp").as("dst"))
              .unionByName(p.select(col("sp").as("src"), col("c").as("dst"))),
            8, columnarEdgeCache = big)
        }.count()
      }
    }
    spark.stop()
  }
}
