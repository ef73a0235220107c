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

  test("columnar corpus path (dst-partitioned cache + broadcast shares) is bit-identical") {
    // the corpus-scale regime: dst-partitioned columnar edge cache and
    // an explicitly-broadcast share frame (round-12 layout). Integer
    // sums are order-independent and the broadcast join emits the same
    // rows, so the ranks must equal the sequential recurrence exactly
    for (k <- Seq(1, 5, 8)) {
      val got = PageRank.ranks(g.toDF("src", "dst"), k,
        columnarEdgeCache = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == seqRanks(g, k), s"k=$k")
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

  /** Sequential reference for the weighted personalized recurrence. */
  private def seqPersonalized(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
                              k: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val tw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val inSeeds = nodes.filter(seeds).toSet
    val ns = inSeeds.size.toLong
    val teleport = (15L * PageRank.Mass) / (100L * ns)
    var r = nodes.map(v => v -> (if (inSeeds(v)) PageRank.Mass / ns else 0L)).toMap
    (1 to k).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) =>
          (85L * r(src) * w) / (100L * tw(src))
        }.sum
      }
      r = nodes.map(v =>
        v -> ((if (inSeeds(v)) teleport else 0L) + in.getOrElse(v, 0L))).toMap
    }
    r
  }

  private def sparkPersonalized(edges: Seq[(Long, Long, Long)],
                                seeds: Seq[Long], k: Int): Map[Long, Long] =
    PageRank.personalized(edges.toDF("src", "dst", "w"), seeds.toDF("node"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // Weighted version of g: the 5→1 edge dominates 5's out-mass 9:1.
  private val wg: Seq[(Long, Long, Long)] =
    Seq((1L, 2L, 3L), (2L, 1L, 1L), (2L, 3L, 2L), (3L, 1L, 5L),
        (5L, 1L, 9L), (5L, 4L, 1L), (3L, 4L, 4L))

  test("personalized ranks equal the sequential weighted recurrence exactly") {
    // seed 99 is outside the graph: must be ignored, not divide the mass
    for (k <- Seq(0, 1, 3, 6)) {
      assert(sparkPersonalized(wg, Seq(5L, 2L, 99L), k) ==
        seqPersonalized(wg, Set(5L, 2L, 99L), k), s"k=$k")
    }
  }

  test("personalized columnar corpus path is bit-identical") {
    for (k <- Seq(1, 6)) {
      val got = PageRank.personalized(wg.toDF("src", "dst", "w"),
        Seq(5L, 2L).toDF("node"), k, columnarEdgeCache = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == seqPersonalized(wg, Set(5L, 2L), k), s"k=$k")
    }
  }

  test("personalized with uniform weights and all-node seeds = global ranks") {
    val uni = g.map { case (s, d) => (s, d, 1L) }
    val all = (g.map(_._1) ++ g.map(_._2)).distinct
    assert(sparkPersonalized(uni, all, 5) == seqRanks(g, 5))
  }

  test("personalized mass concentrates near the seed set") {
    // seed only node 5: its direct 9:1-weighted neighbor 1 must outrank
    // node 4 (reachable from 5 only through the 1-weight edge)
    val r = sparkPersonalized(wg, Seq(5L), 6)
    assert(r(1L) > r(4L))
    // non-seed, non-reachable-from-seed nodes hold no teleport mass:
    // node 5 has no in-edges, so after round 1 its rank is exactly teleport
    assert(r(5L) == (15L * PageRank.Mass) / 100L)
  }

  // Undirected pair graph for the *Symmetric builders: a triangle, a
  // pendant, and a node (7) appearing on BOTH pair sides — the general
  // case the node-wise deg/Σw merge must handle (the q130 trade graph's
  // disjoint even/odd spaces never exercise it).
  private val upairs: Seq[(Long, Long)] =
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (7L, 1L), (4L, 7L))

  test("ranksSymmetric is bit-identical to ranks over the symmetrized edges") {
    val sym = upairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    for (k <- Seq(0, 1, 5, 8); columnar <- Seq(false, true)) {
      val got = PageRank.ranksSymmetric(upairs.toDF("a", "b"), k,
        columnarEdgeCache = columnar)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == seqRanks(sym, k), s"k=$k columnar=$columnar")
    }
  }

  test("personalizedSymmetric is bit-identical to personalized over the symmetrized edges") {
    val wpairs = upairs.zipWithIndex.map { case ((a, b), i) => (a, b, i + 1L) }
    val sym = wpairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    for (k <- Seq(0, 1, 6); columnar <- Seq(false, true)) {
      val got = PageRank.personalizedSymmetric(wpairs.toDF("a", "b", "w"),
        Seq(2L, 7L, 99L).toDF("node"), k, columnarEdgeCache = columnar)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == seqPersonalized(sym, Set(2L, 7L, 99L), k),
        s"k=$k columnar=$columnar")
    }
  }

  test("driver fold equals the distributed rounds on a random pair graph") {
    // r16 optimization pin: under DriverFoldCap the symmetric builders
    // fold on the driver; the distributed rounds must stay bit-equal
    // (incl. self-loops and duplicate pairs, which the random draw hits)
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    val df = pairs.toDF("a", "b")
    for (k <- Seq(0, 1, 8)) {
      val fast = PageRank.ranksSymmetric(df, k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = PageRank
        .ranksSymmetricDistributed(df, k, columnarEdgeCache = false)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == dist, s"k=$k")
    }
    val wdf = pairs.zipWithIndex
      .map { case ((a, b), i) => (a, b, (i % 7 + 1).toLong) }
      .toDF("a", "b", "w")
    val seeds = Seq(1L, 5L, 9L, 999L).toDF("node")
    for (k <- Seq(0, 1, 6)) {
      val fast = PageRank.personalizedSymmetric(wdf, seeds, k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = PageRank.personalizedSymmetricDistributed(
        wdf, seeds, k, columnarEdgeCache = false)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == dist, s"k=$k")
    }
  }

  test("q132 registered query returns segment-proximate suppliers at sf0.001") {
    val out = queries.Registry.byName("q132_personalized_pagerank")
      .run(spark, sfDir).collect()
    assert(out.length > 0 && out.length <= 20)
    val ranks = out.map(_.getLong(2))
    assert(ranks.sameElements(ranks.sortBy(-_)), "sorted by rank desc")
    assert(ranks.forall(_ >= 0))
  }

  test("q130 registered query returns ranked suppliers at sf0.001") {
    val out = queries.Registry.byName("q130_pagerank").run(spark, sfDir).collect()
    assert(out.length > 0 && out.length <= 20)
    val ranks = out.map(_.getLong(2))
    assert(ranks.sameElements(ranks.sortBy(-_)), "sorted by rank desc")
    assert(ranks.forall(_ > 0))
  }
}
