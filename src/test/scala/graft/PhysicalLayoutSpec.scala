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

  test("z-order layout bounds both dimensions per file; 2-D box touches fewer files than a 1-D sort") {
    import graft.ops.ZOrder
    val tmp = java.nio.file.Files.createTempDirectory("graft_z").toString
    val base = Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("ck"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("dy"))
    val nFiles = 64
    // z-clustered layout vs the natural time-sorted layout
    val layout = ZOrder.planZ(base, col("ck"), col("dy"), nFiles)
    layout.df.write.parquet(s"$tmp/by_z")
    base.repartitionByRange(nFiles, col("dy")).sortWithinPartitions(col("dy"))
      .write.parquet(s"$tmp/by_dy")

    // per-file bounding boxes (what parquet footer min/max stats encode)
    def fileBoxes(path: String) =
      spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("ck").as("ck_lo"), max("ck").as("ck_hi"),
             min("dy").as("dy_lo"), max("dy").as("dy_hi"))
        .collect()

    // a box selective in BOTH dims: ~13% of custkeys x one year of dates
    val (ckLo, ckHi) = (100L, 299L)
    val Row2 = base.where(col("dy").isNotNull)
      .agg(min("dy"), max("dy")).head
    val dyMin = Row2.getLong(0)
    val (dyLo, dyHi) = (dyMin + 365L, dyMin + 729L)

    def touched(path: String): Int = fileBoxes(path).count { r =>
      val (cl, ch) = (r.getLong(1), r.getLong(2))
      val (dl, dh) = (r.getLong(3), r.getLong(4))
      cl <= ckHi && ch >= ckLo && dl <= dyHi && dh >= dyLo
    }

    val zTouched = touched(s"$tmp/by_z")
    val dyTouched = touched(s"$tmp/by_dy")
    // the 1-D layout bounds dy only: every file covering the year still
    // spans all custkeys, so it cannot prune on ck. The z layout bounds
    // both, so strictly fewer files intersect the box.
    assert(zTouched < dyTouched,
      s"z=$zTouched files vs dy-sort=$dyTouched files")
    assert(zTouched < nFiles / 2, s"z layout touched $zTouched of $nFiles")

    // physical corner bound: every actual box row lives in a file whose
    // z-interval intersects [z(lo corner), z(hi corner)] — the q128
    // invariant holding at the file grain the scan prunes on. The
    // written layout keeps its rank-space z column; the ZLayout's cuts
    // map the box corners into the same space.
    val (zLo, zHi) =
      layout.zRange(ckLo.toDouble, ckHi.toDouble, dyLo.toDouble, dyHi.toDouble)
    val withF = spark.read.parquet(s"$tmp/by_z")
      .withColumn("f", input_file_name())
    val boxFiles = withF
      .where(col("ck").between(ckLo, ckHi) && col("dy").between(dyLo, dyHi))
      .select("f").distinct().collect().map(_.getString(0)).toSet
    val zRangeFiles = withF
      .groupBy("f").agg(min("z").as("zmin"), max("z").as("zmax"))
      .where(col("zmin") <= zHi && col("zmax") >= zLo)
      .select("f").collect().map(_.getString(0)).toSet
    assert(boxFiles.nonEmpty)
    assert(boxFiles.subsetOf(zRangeFiles),
      s"box rows escaped the z-interval file set: ${boxFiles -- zRangeFiles}")
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

  test("toBucketedTable refuses qualified names and reuses the catalog location") {
    // a db.table name would resolve to a different managed path than the
    // warehouse-dir convention the orphan cleanup assumes — refuse it
    // rather than delete the wrong directory
    intercept[IllegalArgumentException] {
      Load.toBucketedTable(
        Tables.region(spark, sfDir), "somedb.b_region", "r_regionkey", 2)
    }
    // same-session overwrite goes through the catalog's own location:
    // write twice, second write must land (not LOCATION_ALREADY_EXISTS)
    // and read back the fresh rows
    try {
      Load.toBucketedTable(
        Tables.region(spark, sfDir), "b_region", "r_regionkey", 2)
      val n1 = spark.table("b_region").count()
      Load.toBucketedTable(
        Tables.region(spark, sfDir).limit(2), "b_region", "r_regionkey", 2)
      assert(n1 > 2 && spark.table("b_region").count() == 2)
    } finally spark.sql("DROP TABLE IF EXISTS b_region")
  }

  test("AQE splits a planted skewed shuffle join (the engine's skew-join path)") {
    // Skew.scala's contract delegates skewed JOINS to AQE's
    // OptimizeSkewedJoin (salting is for aggregations); this pins that
    // claim with an executed plan — a hot key holding ~50K of 60K left
    // rows must come out of AQE with its sort-merge join marked
    // skew=true (the hot partition split across tasks) instead of one
    // straggler task. Thresholds are scaled to fixture bytes; at
    // cluster scale the defaults (256MB) play the same role.
    import org.apache.spark.sql.functions._
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k)).toMap
    try {
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(0, 60000).select(
        when(col("id") < 50000, 0L).otherwise(col("id") % 2000).as("k"),
        col("id").as("v"))
      val right = spark.range(0, 2000).select(
        col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, Seq("k"))
      assert(joined.collect().length == 60000) // every left row matches once
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot partition:\n${plan.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }
}
