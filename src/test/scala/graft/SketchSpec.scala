package graft

import graft.functions.KMVSketch.kmvMins
import org.apache.spark.sql.functions._

/** Sketch-operator semantics: the bounded KMV aggregate must equal the
  * sort-based formulation (distinct → ORDER BY → LIMIT k) and be
  * invariant to partitioning (lossless partial-aggregate merge).
  */
class SketchSpec extends SparkSpec {

  private val P = graft.functions.TextHash.Mod

  private def hashes = Tables.lineitem(spark, sfDir)
    .select(((lit(982451653L) * col("l_partkey").cast("long") + 12345L) % P).as("h"))

  test("kmv_mins equals distinct-sort-limit") {
    val k = 64
    val viaAgg = hashes.agg(kmvMins(col("h"), k).as("mins"))
      .head().getSeq[Long](0)
    val viaSort = hashes.distinct().orderBy(col("h")).limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(viaAgg === viaSort)
    assert(viaAgg.size === k)
  }

  test("kmv_mins is partition-invariant and dedups") {
    val k = 64
    val doubled = hashes.union(hashes) // duplicates must not change minima
    val a = doubled.repartition(1).agg(kmvMins(col("h"), k)).head().getSeq[Long](0)
    val b = doubled.repartition(13).agg(kmvMins(col("h"), k)).head().getSeq[Long](0)
    val c = hashes.agg(kmvMins(col("h"), k)).head().getSeq[Long](0)
    assert(a === b)
    assert(a === c)
  }

  test("kmv estimate lands near the exact distinct count") {
    val k = 64
    val exact = Tables.lineitem(spark, sfDir).select(col("l_partkey")).distinct().count()
    val mins = hashes.agg(kmvMins(col("h"), k)).head().getSeq[Long](0)
    val est =
      if (mins.size < k) mins.size.toDouble
      else (k - 1).toDouble * P / mins.last
    // KMV relative error ~ 1/sqrt(k) ≈ 12.5%; assert a loose 3-sigma band
    assert(math.abs(est - exact) / exact < 0.4,
      s"est=$est exact=$exact")
  }
}
