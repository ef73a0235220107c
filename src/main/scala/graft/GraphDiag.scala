package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timings for the q130 edge build + PageRank rounds (scratch
  * diagnostic, not part of the driver surface).
  */
object GraphDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/sf10"
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
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gdiag] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val pairs = t("derive pairs") {
      Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
        .distinct()
        .localCheckpoint()
    }
    println(s"[gdiag] pairs=${pairs.count()}")
    val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
      .unionByName(pairs.select(col("sp").as("src"), col("c").as("dst")))
    val ed = t("repartition+sort+ckpt") {
      edges.repartition(col("src")).sortWithinPartitions(col("src")).localCheckpoint()
    }
    val deg = t("deg") {
      ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")).localCheckpoint()
    }
    val nodes = t("nodes") {
      ed.select(col("src").as("node"))
        .unionByName(ed.select(col("dst").as("node"))).distinct().localCheckpoint()
    }
    val n = nodes.count()
    println(s"[gdiag] nodes=$n")
    val teleport = (15L * graft.ops.PageRank.Mass) / (100L * n)
    var r = nodes.select(col("node"), lit(graft.ops.PageRank.Mass / n).as("rank"))
    (0 until 4).foreach { i =>
      r = t(s"round $i (ckpt every round here)") {
        val shares = r.join(deg, Seq("node"))
          .select(col("node").as("src"),
            expr("(85 * rank) div (100 * deg)").as("share"))
        val contribs = ed.join(shares, Seq("src"))
          .select(col("dst").as("node"), col("share").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("sc"))
        nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(teleport) + coalesce(col("sc"), lit(0L))).as("rank"))
          .localCheckpoint()
      }
    }
    // the old shape for comparison: deg carried per edge, no explicit
    // repartition (whatever the deg join leaves behind)
    val edOld = t("OLD edges-join-deg ckpt") {
      edges.join(edges.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
        .localCheckpoint()
    }
    var r2 = nodes.select(col("node"), lit(graft.ops.PageRank.Mass / n).as("rank"))
    (0 until 4).foreach { i =>
      r2 = t(s"OLD round $i") {
        val contribs = edOld.join(r2, edOld("src") === r2("node"))
          .select(edOld("dst").as("node"),
            expr("(85 * rank) div (100 * deg)").as("c"))
          .groupBy(col("node")).agg(sum(col("c")).as("sc"))
        nodes.join(contribs, Seq("node"), "left")
          .select(col("node"),
            (lit(teleport) + coalesce(col("sc"), lit(0L))).as("rank"))
          .localCheckpoint()
      }
    }
    spark.stop()
  }
}
