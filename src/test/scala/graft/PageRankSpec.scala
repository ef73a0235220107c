package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Fixed-point PageRank (SURVEY §2 extension surface, q130).
  *
  * The load-bearing check is exact equality against an independent
  * sequential implementation of the same integer recurrence: the
  * distributed version has no float slack to hide behind, so any
  * partitioning/ordering/join bug shows up as a unit-level diff.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference: same recurrence, scala Maps, one thread. */
  private def seqRanks(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val teleport = (15L * PageRank.Mass) / (100L * n)
    var r = nodes.map(_ -> PageRank.Mass / n).toMap
    (1 to k).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => (85L * r(src)) / (100L * deg(src)) }.sum
      }
      r = nodes.map(v => v -> (teleport + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def sparkRanks(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    PageRank.ranks(edges.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // Asymmetric directed graph with a dangling node (4 has no out-edge),
  // a hub (everything points at 1), and a 2-cycle.
  private val g: Seq[(Long, Long)] =
    Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (5L, 1L), (5L, 4L), (3L, 4L))

  test("distributed ranks equal the sequential integer recurrence exactly") {
    for (k <- Seq(0, 1, 3, 8)) {
      assert(sparkRanks(g, k) == seqRanks(g, k), s"k=$k")
    }
  }

  test("ranks are invariant under edge partitioning and order") {
    val want = seqRanks(g, 5)
    val shuffled = scala.util.Random.shuffle(g)
    val got = PageRank.ranks(
      shuffled.toDF("src", "dst").repartition(7, col("dst")), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("mass accounting: total rank stays within floor-loss of Mass") {
    val r = sparkRanks(g, 8)
    val total = r.values.sum
    assert(total <= PageRank.Mass)
    // Only floor remainders and the dangling node's damped mass leak;
    // with one dangling node out of five, total keeps >= teleport mass
    // plus the non-dangling 85% shares — loosely, more than half.
    assert(total > PageRank.Mass / 2, s"total=$total")
    // hub (node 1) with three in-edges outranks the dangling sink's
    // teleport-only floor, and every rank is at least teleport
    val teleport = (15L * PageRank.Mass) / (100L * 5L)
    assert(r(1L) > r(4L) && r.values.forall(_ >= teleport))
  }

  test("q130 registered query returns ranked suppliers at sf0.001") {
    val out = queries.Registry.byName("q130_pagerank").run(spark, sfDir).collect()
    assert(out.length > 0 && out.length <= 20)
    val ranks = out.map(_.getLong(2))
    assert(ranks.sameElements(ranks.sortBy(-_)), "sorted by rank desc")
    assert(ranks.forall(_ > 0))
  }
}
