package graft

import graft.pipeline.Load
import org.apache.spark.sql.functions._

/** Physical-layout evidence for the 100 TB posture: partition pruning on
  * the partitioned sink, and exchange-free joins between co-bucketed
  * tables.
  */
class PhysicalLayoutSpec extends SparkSpec {

  test("partitioned sink prunes partitions on read") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    val orders = Tables.orders(spark, sfDir)
      .withColumn("yr", year(col("o_orderdate")))
    Load.toPartitionedParquet(orders, s"$tmp/orders_by_year", Seq("yr"))

    val pruned = spark.read.parquet(s"$tmp/orders_by_year")
      .where(col("yr") === 1997)
    // plan must carry the partition filter (directory-level pruning)
    val planText = pruned.queryExecution.executedPlan.toString
    assert(planText.contains("PartitionFilters") &&
      planText.contains("yr"), planText.take(600))
    val expected = orders.where(col("yr") === 1997).count()
    assert(pruned.count() == expected)
    // only the matching partition directory is listed
    val dirs = new java.io.File(s"$tmp/orders_by_year").list().toSeq
      .filter(_.startsWith("yr="))
    assert(dirs.size > 1) // multiple years exist...
    assert(dirs.contains("yr=1997")) // ...and the target among them
  }

  test("co-bucketed join plans without a shuffle exchange") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Load.toBucketedTable(
        Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
        "b_orders", "o_orderkey", 8)
      Load.toBucketedTable(
        Tables.lineitem(spark, sfDir)
          .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("qty")),
        "b_lineagg", "l_orderkey", 8)
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineagg"),
              col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucketed sides: a sort-merge join with no Exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineagg")
    }
  }
}
