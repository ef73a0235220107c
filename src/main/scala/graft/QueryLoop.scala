package graft

import org.apache.spark.sql.SparkSession

/** Steady-state timer: runs the named query N times in one
  * session. Separates one-time JVM/codegen warmup from the repeatable query cost — single-shot bench rows on this box carry 1-5 s of janino/JIT compile that is NOT plan cost. (Not part of the driver surface.)
  */
object QueryLoop {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: graft.QueryLoop <query_name> [n_runs]\n" +
        "  env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), " +
        "SPARK_GRAFT_CPUS (default 32)")
      sys.exit(2)
    }
    val name = args(0)
    if (!queries.Registry.byName.contains(name)) {
      val near = queries.Registry.byName.keys.toSeq
        .filter(k => k.contains(name) || name.contains(k.takeWhile(_ != '_')))
        .sorted.take(5)
      System.err.println(s"unknown query '$name'" +
        (if (near.nonEmpty) s"; nearest: ${near.mkString(", ")}" else ""))
      sys.exit(2)
    }
    val n = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val q = queries.Registry.byName(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      q.run(spark, sfDir).collect()
      println(f"[loop] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
