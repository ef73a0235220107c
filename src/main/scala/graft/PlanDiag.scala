package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch plan inspector for the columnar edge-cache claim (round 12
  * regime): does a corpus PageRank round — broadcast-hash join of the
  * node-sized share frame into a DST-partitioned cached edge list,
  * then groupBy(dst) — run with ZERO Exchange end to end? The cache's
  * HashPartitioning(dst) must survive the BHJ and the dst→node alias
  * so the aggregate's required distribution is already met. (Not part
  * of the driver surface.)
  */
object PlanDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("sp"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
      .unionByName(pairs.select(col("sp").as("src"), col("c").as("dst")))
    // the columnar regime, exactly as PageRank.persistEdges builds it
    val ed = edges.repartition(col("dst")).sortWithinPartitions(col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    ed.count()
    val nodes = ed.select(col("src").as("node"))
      .unionByName(ed.select(col("dst").as("node"))).distinct()
      .join(ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")), Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint()
    val r = nodes.select(col("node"), col("deg"), lit(1000000L).as("rank"))
    val shares = r.where(col("deg") > 0)
      .select(col("node").as("src"), expr("(85 * rank) div (100 * deg)").as("share"))
    // the corpus round, exactly as PageRank.ranks builds it
    val contribs = ed.join(broadcast(shares), Seq("src"))
      .select(col("dst").as("node"), col("share").as("c"))
      .groupBy(col("node")).agg(sum(col("c")).as("sc"))
    contribs.collect()
    println("=== COLUMNAR round (dst-partitioned cache + broadcast shares), AQE final ===")
    contribs.explain()
    // Count exchanges on the ROUND's own path only: the plan string
    // embeds the InMemoryRelation's one-time BUILD plan (REPARTITION_BY_COL
    // + the edge derivation's shuffles) below the InMemoryTableScan leaf —
    // those run once at cache build, not per round. Everything printed
    // ABOVE the first InMemoryRelation line is the per-round pipeline
    // (final agg ← partial agg ← project ← broadcast join ← cached scan).
    val roundLines = contribs.queryExecution.executedPlan.toString
      .linesIterator.takeWhile(!_.contains("InMemoryRelation")).toSeq
    val exchanges = roundLines.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
    println(s"[plandiag] non-broadcast Exchange operators on the per-round " +
      s"path: $exchanges" +
      (if (exchanges == 0) " (zero-exchange round confirmed)" else " (UNEXPECTED)"))
    spark.stop()
  }
}
