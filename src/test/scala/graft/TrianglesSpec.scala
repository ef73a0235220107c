package graft

import graft.ops.Triangles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Properties of the degree-ordered triangle census behind q131:
  * planted cliques count exactly, triangle-free shapes count zero,
  * the equal-degree tie-break is consistent (every triangle found
  * exactly once, never zero or twice), and — the scale claim — the
  * oriented wedge volume respects the O(m^1.5) bound on a skewed hub
  * graph where the naive neighbor self-join blows past it.
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDF(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .distinct.toDF("a", "b")

  private def resultMap(edges: DataFrame): Map[Long, (Long, Long)] =
    Triangles.perNode(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("driver fold equals the distributed census on a random graph") {
    // r16 optimization pin: under DriverFoldCap perNode folds on the
    // driver; node/deg/n_tri must equal the distributed census exactly
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(600)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (x, y) => x != y }
    val df = edgesDF(pairs)
    val fast = Triangles.perNode(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val dist = Triangles.perNodeDistributed(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(fast == dist)
    // non-canonical input (duplicate row) must fall back, not mis-fold:
    // the fold path is only taken on the documented contract
    val dup = (pairs.take(5) ++ pairs.take(1))
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      .toDF("a", "b")
    val viaPublic = Triangles.perNode(dup).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val viaDist = Triangles.perNodeDistributed(dup).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(viaPublic == viaDist)
  }

  test("planted k-clique: C(k,3) triangles, C(k-1,2) per clique node") {
    val k = 6L
    val clique = for (i <- 0L until k; j <- i + 1 until k) yield (i, j)
    // plus a triangle-free pendant chain sharing node 0
    val chain = Seq((0L, 10L), (10L, 11L), (11L, 12L))
    val res = resultMap(edgesDF(clique ++ chain))
    for (i <- 1L until k)
      assert(res(i) == ((k - 1, (k - 1) * (k - 2) / 2)), s"node $i: ${res(i)}")
    assert(res(0L) == ((k, (k - 1) * (k - 2) / 2)))
    assert(res(10L) == ((2L, 0L)) && res(11L) == ((2L, 0L)) &&
      res(12L) == ((1L, 0L)))
    // global: each triangle counted at exactly 3 node incidences
    val total = res.values.map(_._2).sum
    assert(total == 3 * k * (k - 1) * (k - 2) / 6, total.toString)
  }

  test("star graph: zero triangles at every node") {
    val res = resultMap(edgesDF((1L to 30L).map(i => (0L, i))))
    assert(res(0L) == ((30L, 0L)))
    assert((1L to 30L).forall(i => res(i) == ((1L, 0L))))
  }

  test("equal-degree cycles: the id tie-break finds C3 once, C4/C5 never") {
    // every node in a cycle has degree 2 — orientation falls entirely
    // to the id tie-break; a wrong tie-break double-counts or drops
    val c3 = resultMap(edgesDF(Seq((0L, 1L), (1L, 2L), (0L, 2L))))
    assert(c3 == Map(0L -> ((2L, 1L)), 1L -> ((2L, 1L)), 2L -> ((2L, 1L))))
    val c4 = resultMap(edgesDF(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))))
    assert(c4.values.forall(_ == ((2L, 0L))))
    val c5 = resultMap(edgesDF(
      Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 4L))))
    assert(c5.values.forall(_ == ((2L, 0L))))
  }

  test("skewed hub: oriented wedges within m^1.5 where naive wedges exceed it") {
    // hub 0 joined to 1..40, spokes chained i—i+1: 79 edges, and the
    // naive apex self-join pays C(40,2)=780 wedges at the hub alone —
    // past m^1.5 ≈ 702. The orientation must charge the hub's wedges
    // to its out-ranking neighbors instead.
    val pairs = (1L to 40L).map(i => (0L, i)) ++
      (1L until 40L).map(i => (i, i + 1))
    val e = edgesDF(pairs)
    val m = e.count()
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val wedges = Triangles.oriented(e, deg)
      .groupBy(col("src")).agg(count(lit(1)).as("d"))
      .agg(sum((col("d") * (col("d") - 1) / 2).cast("long")))
      .collect()(0).getLong(0)
    val naiveHubWedges = 40L * 39 / 2
    assert(naiveHubWedges > math.pow(m.toDouble, 1.5).toLong)
    assert(wedges <= math.pow(m.toDouble, 1.5).toLong,
      s"oriented wedges $wedges exceed m^1.5 for m=$m")
    assert(wedges < naiveHubWedges / 5,
      s"orientation barely beats naive: $wedges vs $naiveHubWedges")
    // and the counts are right: triangles (0, i, i+1) for i in 1..39
    val res = resultMap(e)
    assert(res(0L)._2 == 39L)
    assert(res(1L)._2 == 1L && res(40L)._2 == 1L)
    assert((2L until 40L).forall(i => res(i)._2 == 2L))
  }
}
