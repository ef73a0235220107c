package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Driver-fold output row (top-level for by-name encoder resolution). */
final case class PrRank(node: Long, rank_units: Long)

/** Distributed PageRank in exact fixed-point integer arithmetic.
  *
  * Rank mass is carried as BIGINT units ([[Mass]] total, ~1e12), every
  * division is a floor division on non-negative longs, and every
  * aggregate is an integer sum. Integer addition is associative, so the
  * result is bit-identical under any partitioning, any summation order,
  * and any engine — the same closure-by-construction the engine's money
  * sums use — which is what lets an iterative float-free oracle replay
  * the fixpoint hash-exactly (see GraphOps.q130). The standard float
  * formulation differs per-engine in the 1e-16s from round one and the
  * drift compounds per iteration.
  *
  * Semantics per round (damping 0.85 expressed as the 85/100 ratio):
  *
  *   contrib(u→v) = (85 * r(u)) div (100 * deg(u))
  *   r'(v)        = (15 * Mass) div (100 * N)  +  Σ_{u→v} contrib(u→v)
  *
  * Floor losses (the sub-unit remainders of each division) and the mass
  * of dangling nodes are dropped, not redistributed — the well-known
  * "dangling mass removed" PageRank variant. Both choices are exact and
  * deterministic; with Mass = 1e12 the relative loss per round is
  * ≤ N·(deg-division remainder) / Mass ≈ 1e-6 at a million nodes, far
  * below ranking resolution.
  *
  * Iterative shape (the q60/q99 driver-round pattern):
  *  - the BARE edge list (src, dst[, w] — the narrowest possible big
  *    table) is materialized ONCE (see [[persistEdges]]); on the
  *    corpus-scale columnar path it is hash-partitioned by DST, and
  *    the cache preserves that, so every round's contribution
  *    aggregate — the only edge-sized exchange left after round 11's
  *    layout — needs NO shuffle at all: the share side broadcasts
  *    (node-sized), the broadcast-hash join preserves the streamed
  *    edge partitioning, and groupBy(dst) finds its required
  *    distribution already satisfied. A corpus round is one cache
  *    scan plus node-sized work. (localCheckpoint cannot carry
  *    partitioning metadata — its scans report UnknownPartitioning —
  *    so the small/medium path skips the pre-shuffle and relies on
  *    AQE instead, below.)
  *  - per-src denominators (deg / Σw) ride IN THE RANK FRAME, not on
  *    every edge row: each round's share (share(u) = (85·r(u)) div
  *    (100·deg(u)), one row per node) is a pure PROJECTION of the
  *    rank frame. Same integer value per edge as the old per-edge
  *    form, a third fewer cached bytes, one fewer corpus-sized
  *    shuffle at build (the old edges⋈deg) — and, critically, a
  *    single measurable stage on the small side of the big join, so
  *    AQE converts it to broadcast-hash below the node-size
  *    threshold (a join-shaped share side is unmeasurable mid-stage
  *    and pinned the corpus side into a full per-round sort —
  *    measured 2.5× on q130 at sf10, round 11);
  *  - each small/medium round is the canonical two-shuffle PageRank
  *    step: join shares into edges on src (shares are node-sized —
  *    only they move), then an integer-sum aggregate; corpus rounds
  *    (columnar path) drop both exchanges — broadcast join + an
  *    aggregate running in the cache's own dst partitioning (a
  *    src-partitioned cache looks cheaper on the JOIN but re-shuffles
  *    ~every edge row in the aggregate every round: dsts scatter
  *    across src-keyed tasks, so map-side combine collapses almost
  *    nothing — measured ~19 GB/round at sf100, round 11);
  *  - ranks are localCheckpoint'ed per round, so lineage stays O(1)
  *    across rounds instead of O(k); retired snapshots release their
  *    BLOCKS, not just cache entries (see [[releaseLocalCkpt]]).
  */
object PageRank {

  /** Total rank mass in fixed-point units. */
  val Mass: Long = 1000000000000L

  /** Pair count up to which the SYMMETRIC fixpoints fold on the driver
    * (round-16 optimization; the ConnectedComponents.DriverFoldCap
    * pattern, sized up because the collect is a flat (Long, Long[, w])
    * tuple array: 2^20 pairs ≈ 24 MB — bounded by construction via the
    * limit(cap+1) probe). Integer fixed-point arithmetic is
    * order-independent, so the driver fold is bit-identical to the
    * distributed rounds (PageRankSpec pins it); above the cap, and on
    * every corpus-scale call (the columnar-edge-cache hint), the
    * distributed path runs unchanged. What it buys at the benched
    * sf0.1 point: the k-round loop was ~45 scheduling round-trips
    * (per-round join/agg stages + localCheckpoint jobs) over
    * node-sized frames — pure latency, not plan cost (guide §1.2:
    * algorithm first).
    */
  private[graft] val DriverFoldCap = 1 << 20

  /** Rounds between rank localCheckpoints. Each checkpoint is an eager
    * materialization (a scheduled job); batching 2 rounds per
    * checkpoint halves that floor while keeping lineage O(1)-bounded
    * (≤2 rounds deep). The arithmetic is identical either way — the
    * checkpoint is an execution boundary, not a semantic one — which
    * PageRankSpec's exact-equality tests pin.
    */
  private val CheckpointEvery = 2

  /** Materialize the degree-annotated edge list once. Two regimes:
    *
    *  - `columnar = false` (default, small/medium graphs):
    *    localCheckpoint — the cheapest one-shot materialization; its
    *    deserialized row storage is fine while the edge list is far
    *    smaller than memory.
    *  - `columnar = true` (corpus-scale, the caller's scale hint):
    *    persist(MEMORY_AND_DISK_SER) through the compressed columnar
    *    cache. localCheckpoint's deserialized rows measured ~100 GB at
    *    the sf100 rung (1.17B edges off 600M lineitems) and took the
    *    box's disk down; the columnar form stores the same three long
    *    columns ~10× smaller and still preserves the join-aligned
    *    partitioning the per-round SMJ reuses. Lineage is kept —
    *    blocks evicted under pressure re-derive instead of failing —
    *    and the eager count() pays the materialization exactly once.
    *    (Not the default: the cache build costs ~5 s even at sf0.1's
    *    1.2M edges, a pure regression where the old path was 6 s
    *    total.)
    */
  private def persistEdges(ed: DataFrame, columnar: Boolean): DataFrame =
    if (!columnar) ed.localCheckpoint()
    else {
      // partition by DST before caching: InMemoryRelation preserves the
      // partitioning (unlike localCheckpoint, whose LogicalRDD scans
      // report UnknownPartitioning — measured, round 11). Round 11
      // partitioned by SRC for a zero-exchange sort-merge join — but
      // the join was never the edge-sized cost: the corpus path
      // BROADCASTS the node-sized share frame (see ranks), so the join
      // needs no edge exchange under EITHER layout. The edge-sized
      // cost was the per-round contribution aggregate: groupBy(dst)
      // over a src-partitioned cache re-shuffles ~every edge row every
      // round (dsts are scattered across tasks, so map-side combine
      // collapses almost nothing — at sf100 that was ~19 GB of shuffle
      // per round, ×8 rounds). dst-partitioned, the aggregate's
      // required distribution is already satisfied and every round
      // runs ZERO-exchange end to end: scan → broadcast-hash join →
      // in-partition final aggregate. The one-time price is the deg/Σw
      // build aggregate, which loses its co-partitioning and pays ONE
      // edge-sized shuffle at build — 1 vs the 8 per-round ones it
      // buys back. The within-partition sort keeps the dst column
      // RLE/delta-friendly for the columnar compressor (the cache is
      // scanned 8×; narrower is faster).
      val p = ed.repartition(col("dst")).sortWithinPartitions(col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      p.count()
      p
    }

  private def releaseLocalCkpt(df: DataFrame): Unit =
    CheckpointBlocks.release(df)

  /** Release the edge cache: the columnar regime is a CacheManager
    * entry (`Dataset.unpersist` works); the localCheckpoint regime
    * needs the block-level release.
    */
  private def releaseEdges(ed: DataFrame, columnar: Boolean): Unit =
    if (columnar) { ed.unpersist(false); () } else releaseLocalCkpt(ed)

  /** Ranks after `k` rounds over a directed edge list (`src`, `dst`:
    * long). Edges are taken as-is — callers dedup and symmetrize as
    * their graph semantics require. Nodes = every endpoint; nodes with
    * no out-edges hold teleport-only rank (their mass is dropped).
    *
    * Returns (`node` long, `rank_units` long), one row per node.
    */
  def ranks(edges: DataFrame, k: Int,
            columnarEdgeCache: Boolean = false): DataFrame = {
    require(k >= 0, s"pagerank rounds must be >= 0, got $k")
    // cache the BARE (src, dst) pairs: degrees are NOT carried per
    // edge — they ride in the rank frame below and the round's share
    // pre-division is a pure projection (same integer per-edge value,
    // a third fewer cached bytes, one fewer corpus shuffle at build:
    // the old edges⋈deg materialization).
    val ed = persistEdges(edges, columnarEdgeCache)
    // partial aggs combine map-side; the exchange carries node-sized
    // partials only
    val deg = ed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
    // the node spine CARRIES deg (0 for dangling nodes): the per-round
    // share is then a projection over the rank frame alone — one
    // measurable shuffle stage on the small side of the big join, which
    // is what lets AQE convert it to broadcast-hash below the node-size
    // threshold (a join-shaped small side is unmeasurable mid-stage and
    // pins the corpus side into a full per-round sort — measured 2.5×
    // on q130 at sf10, round 11)
    val nodes = ed.select(col("src").as("node"))
      .unionByName(ed.select(col("dst").as("node")))
      .distinct()
      .join(deg, Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint()
    iterateRanks(ed, nodes, k, columnarEdgeCache)
  }

  /** [[ranks]] specialized to an UNDIRECTED graph given as its distinct
    * pair list (`a`, `b`: long, one row per unordered edge) — the shape
    * every corpus graph in this engine starts from (the q130 trade
    * pairs). Symmetrization (both directions) happens inside; the build
    * aggregates run on the HALF-sized pair frame instead of the
    * symmetrized one (round-12 verdict lever): deg comes from two
    * pair-frame aggregates merged node-wise (node-sized inputs), and the
    * node spine IS that deg frame — the old path's distinct over
    * 2·|edges| endpoint rows (the largest single build aggregate at the
    * sf100 rung) disappears entirely. In a symmetric graph every
    * endpoint has an out-edge, so deg ≥ 1 and the spine is complete by
    * construction — no dangling left-join. Integer sums are
    * order-independent, so ranks are bit-identical to
    * `ranks(a→b ∪ b→a)`; PageRankSpec pins that equality.
    */
  def ranksSymmetric(pairs: DataFrame, k: Int,
                     columnarEdgeCache: Boolean = false): DataFrame = {
    require(k >= 0, s"pagerank rounds must be >= 0, got $k")
    if (!columnarEdgeCache) {
      driverRanksSymmetric(pairs, k) match {
        case Some(out) => return out
        case None => ()
      }
    }
    ranksSymmetricDistributed(pairs, k, columnarEdgeCache)
  }

  /** The distributed [[ranksSymmetric]] body — the scale path above
    * [[DriverFoldCap]] and the equality reference for PageRankSpec's
    * fast==distributed pin.
    */
  private[graft] def ranksSymmetricDistributed(
      pairs: DataFrame, k: Int, columnarEdgeCache: Boolean): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    val ed = persistEdges(edges, columnarEdgeCache)
    // deg(v) = #pairs containing v: two half-sized aggregates whose
    // node-sized partials merge in one final node-keyed sum (a node can
    // appear on both sides in general graphs; disjoint id spaces just
    // make one of the two partials empty per node)
    val nodes = pairs.groupBy(col("a").as("node")).agg(count(lit(1)).as("d"))
      .unionByName(pairs.groupBy(col("b").as("node")).agg(count(lit(1)).as("d")))
      .groupBy(col("node")).agg(sum(col("d")).as("deg"))
      .localCheckpoint()
    iterateRanks(ed, nodes, k, columnarEdgeCache)
  }

  /** The k-round fixpoint shared by [[ranks]] and [[ranksSymmetric]]:
    * `ed` the cached edge list, `nodes` the checkpointed (node, deg)
    * spine.
    */
  private def iterateRanks(ed: DataFrame, nodes: DataFrame, k: Int,
                           columnarEdgeCache: Boolean): DataFrame = {
    val n = nodes.count()
    if (n == 0) {
      // empty graph (r13 degenerate sweep): no nodes, no ranks — an
      // empty result, not a dead query (materialized BEFORE the spine's
      // checkpoint blocks are released)
      val out = nodes.select(col("node"), lit(0L).as("rank_units"))
        .localCheckpoint()
      releaseEdges(ed, columnarEdgeCache)
      releaseLocalCkpt(nodes)
      return out
    }
    val teleport = (15L * Mass) / (100L * n)

    // the rank frame carries (node, deg, rank) — deg is loop-invariant
    var r = nodes.select(col("node"), col("deg"), lit(Mass / n).as("rank"))
    // retire the previous rank snapshot once the next one is
    // materialized: live storage stays O(1) rounds instead of O(k)
    // (node-sized blocks, but at 16M+ nodes that is GBs per snapshot)
    var prevCkpt: DataFrame = null
    var i = 0
    while (i < k) {
      // pre-divide on the node side: one div per NODE, then the big
      // join ships only (src, share). Dangling nodes (deg 0) emit no
      // share — the same rows the old per-edge form never saw.
      val shares = r.where(col("deg") > 0)
        .select(col("node").as("src"),
          expr("(85 * rank) div (100 * deg)").as("share"))
      // corpus path: broadcast the node-sized share frame explicitly —
      // nodes run orders of magnitude below edges (|C|+|S| vs the
      // distinct trade pairs), so even at the 100 TB point the share
      // frame is a few hundred MB against TBs of edges. With the cache
      // dst-partitioned (persistEdges), the whole round is then
      // exchange-free on the edge side: broadcast-hash join preserves
      // the streamed side's partitioning, the (dst→node) alias keeps
      // it through the projection, and the aggregate's required
      // distribution is already met. Below the threshold AQE makes the
      // same call on its own. Bit-identical either way: the join emits
      // the same rows and integer sums are order-independent
      // (PageRankSpec pins the columnar path against the sequential
      // recurrence).
      val contribs = ed
        .join(if (columnarEdgeCache) broadcast(shares) else shares, Seq("src"))
        .select(col("dst").as("node"), col("share").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("sc"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(teleport) + coalesce(col("sc"), lit(0L))).as("rank"))
      if (i % CheckpointEvery == CheckpointEvery - 1 || i == k - 1) {
        r = next.localCheckpoint()
        if (prevCkpt != null) releaseLocalCkpt(prevCkpt)
        prevCkpt = r
      } else r = next
      i += 1
    }
    // the final round always checkpoints, so the edge cache and the
    // node spine can be released before the caller's (top-k, join-back)
    // follow-up work
    if (k > 0) {
      releaseEdges(ed, columnarEdgeCache)
      releaseLocalCkpt(nodes)
    }
    r.select(col("node"), col("rank").as("rank_units"))
  }

  /** Weighted, personalized PageRank — same exact fixed-point integer
    * discipline as [[ranks]], with two generalizations:
    *
    *  - **edge weights**: each out-edge carries an integer weight `w`;
    *    a node's rank splits proportionally to weight instead of
    *    uniformly:  contrib(u→v) = (85 * r(u) * w(u,v)) div (100 * W(u))
    *    where W(u) = Σ_v w(u,v). Exact-overflow bound: the product
    *    85 * r(u) * w needs r(u)·w < 2^63/85 ≈ 1.1e17; with total mass
    *    1e12 that admits per-edge weights up to ~1e5 even if one node
    *    held ALL the mass — and in practice r(u) shrinks as 1/N, so the
    *    bound loosens linearly with graph size (100 TB-safe for any
    *    count-like weight).
    *  - **personalization**: the teleport term lands only on a seed set
    *    S (restart distribution uniform over S), and the initial mass
    *    starts on S:  r'(v) = [v∈S]·(15·Mass) div (100·|S|) + Σ contribs.
    *    Ranks then measure proximity to S through weighted trade flow —
    *    the standard personalized-PageRank semantics (Page et al. 1999,
    *    §6 "personalized" E vector), in the same dangling-mass-removed
    *    variant as [[ranks]].
    *
    * `edges`: (`src` long, `dst` long, `w` long ≥ 1). `seeds`: (`node`
    * long); seeds outside the graph's node set are ignored (they could
    * never receive or emit mass). Returns (`node`, `rank_units`).
    */
  def personalized(edges: DataFrame, seeds: DataFrame, k: Int,
                   columnarEdgeCache: Boolean = false): DataFrame = {
    require(k >= 0, s"pagerank rounds must be >= 0, got $k")
    // same cached-layout discipline as [[ranks]]: bare (src, dst, w);
    // the Σw denominator rides in the rank frame (see ranks — the
    // projection-shaped share side is what keeps the big join
    // AQE-convertible)
    val ed = persistEdges(edges, columnarEdgeCache)
    val wsum = ed.groupBy(col("src")).agg(sum(col("w")).as("tw"))
      .select(col("src").as("node"), col("tw"))
    val nodes = ed.select(col("src").as("node"))
      .unionByName(ed.select(col("dst").as("node")))
      .distinct()
    // seed flag AND Σw materialized once onto the node spine (the
    // rank frame below carries both, so the per-round share side is a
    // pure projection — see ranks)
    val nodesS = nodes
      .join(seeds.select(col("node"), lit(1L).as("seed1")).distinct(),
        Seq("node"), "left")
      .join(wsum, Seq("node"), "left")
      .select(col("node"), coalesce(col("seed1"), lit(0L)).as("seed"),
        coalesce(col("tw"), lit(0L)).as("tw"))
      .localCheckpoint()
    iteratePersonalized(ed, nodesS, k, columnarEdgeCache)
  }

  /** [[personalized]] specialized to an UNDIRECTED weighted graph given
    * as its pair list (`a`, `b`, `w`: long, one row per unordered
    * edge) — the [[ranksSymmetric]] construction for the weighted
    * personalized variant: Σw per node from two half-sized pair-frame
    * aggregates merged node-wise, the spine from that frame (symmetric ⇒
    * every endpoint emits, tw ≥ w ≥ 1), and NO distinct over the
    * 2·|edges| symmetrized endpoints. Bit-identical to
    * `personalized(a→b ∪ b→a)` — integer sums commute; PageRankSpec
    * pins the equality.
    */
  def personalizedSymmetric(pw: DataFrame, seeds: DataFrame, k: Int,
                            columnarEdgeCache: Boolean = false): DataFrame = {
    require(k >= 0, s"pagerank rounds must be >= 0, got $k")
    if (!columnarEdgeCache) {
      driverPersonalizedSymmetric(pw, seeds, k) match {
        case Some(out) => return out
        case None => ()
      }
    }
    personalizedSymmetricDistributed(pw, seeds, k, columnarEdgeCache)
  }

  /** The distributed [[personalizedSymmetric]] body — see
    * [[ranksSymmetricDistributed]].
    */
  private[graft] def personalizedSymmetricDistributed(
      pw: DataFrame, seeds: DataFrame, k: Int,
      columnarEdgeCache: Boolean): DataFrame = {
    val edges = pw.select(col("a").as("src"), col("b").as("dst"), col("w"))
      .unionByName(pw.select(col("b").as("src"), col("a").as("dst"), col("w")))
    val ed = persistEdges(edges, columnarEdgeCache)
    val tw = pw.groupBy(col("a").as("node")).agg(sum(col("w")).as("t"))
      .unionByName(pw.groupBy(col("b").as("node")).agg(sum(col("w")).as("t")))
      .groupBy(col("node")).agg(sum(col("t")).as("tw"))
    val nodesS = tw
      .join(seeds.select(col("node"), lit(1L).as("seed1")).distinct(),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("seed1"), lit(0L)).as("seed"), col("tw"))
      .localCheckpoint()
    iteratePersonalized(ed, nodesS, k, columnarEdgeCache)
  }

  /** The k-round weighted personalized fixpoint shared by
    * [[personalized]] and [[personalizedSymmetric]]: `ed` the cached
    * (src, dst, w) edges, `nodesS` the checkpointed (node, seed, tw)
    * spine.
    */
  private def iteratePersonalized(ed: DataFrame, nodesS: DataFrame, k: Int,
                                  columnarEdgeCache: Boolean): DataFrame = {
    val ns = nodesS.where(col("seed") === 1L).count()
    if (ns == 0) {
      // no in-graph seed (r13 degenerate sweep — includes the empty
      // graph): the restart distribution is empty, so no mass ever
      // enters and every node's rank is exactly 0 for any k — return
      // that closed form instead of dying on the teleport division
      releaseEdges(ed, columnarEdgeCache)
      val out = nodesS.select(col("node"), lit(0L).as("rank_units"))
        .localCheckpoint()
      releaseLocalCkpt(nodesS)
      return out
    }
    val teleport = (15L * Mass) / (100L * ns)

    // rank frame carries (node, seed, tw, rank) — seed/tw loop-invariant
    var r = nodesS.select(col("node"), col("seed"), col("tw"),
      (col("seed") * lit(Mass / ns)).as("rank"))
    var prevCkpt: DataFrame = null
    var i = 0
    while (i < k) {
      // weighted pre-division carries the per-node NUMERATOR (85·r)
      // and DENOMINATOR (100·Σw); the per-edge value
      // (r85 · w) div tw100 = (85·r·w) div (100·Σw) is the identical
      // long product and floor-division — same bits, narrower big join.
      // Nodes with no out-edges (tw 0) emit no share, as before.
      val shares = r.where(col("tw") > 0)
        .select(col("node").as("src"),
          (lit(85L) * col("rank")).as("r85"),
          (lit(100L) * col("tw")).as("tw100"))
      // same broadcast-the-node-frame discipline as ranks: the
      // dst-partitioned cache + broadcast share side make each round
      // exchange-free on the edge side (see ranks for the full
      // reasoning and the bit-identity argument)
      val contribs = ed
        .join(if (columnarEdgeCache) broadcast(shares) else shares, Seq("src"))
        .select(col("dst").as("node"),
          expr("(r85 * w) div tw100").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("sc"))
      val next = nodesS.join(contribs, Seq("node"), "left")
        .select(col("node"), col("seed"), col("tw"),
          (col("seed") * lit(teleport) + coalesce(col("sc"), lit(0L)))
            .as("rank"))
      if (i % CheckpointEvery == CheckpointEvery - 1 || i == k - 1) {
        r = next.localCheckpoint()
        if (prevCkpt != null) releaseLocalCkpt(prevCkpt)
        prevCkpt = r
      } else r = next
      i += 1
    }
    if (k > 0) {
      releaseEdges(ed, columnarEdgeCache)
      releaseLocalCkpt(nodesS)
    }
    r.select(col("node"), col("rank").as("rank_units"))
  }

  /** Long-typed (a, b[, w]) schema guard for the driver folds — the
    * [[graft.ops.ConnectedComponents]] rule: any other id type keeps
    * the distributed path, whose output node type follows the input.
    */
  private def longCols(df: DataFrame, names: String*): Boolean =
    names.forall(n => df.schema.fields.exists(f =>
      f.name == n &&
        f.dataType == org.apache.spark.sql.types.LongType))

  /** [[ranksSymmetric]] folded on the driver when the pair list fits
    * [[DriverFoldCap]] (probe: one bounded limit(cap+1) job). None when
    * it does not, or when the ids are not Long. Bit-identical to the
    * distributed rounds: same deg/spine construction, same per-round
    * floor divisions, and integer sums commute.
    */
  private def driverRanksSymmetric(pairs: DataFrame, k: Int)
      : Option[DataFrame] = {
    if (!longCols(pairs, "a", "b")) return None
    val spark = pairs.sparkSession
    import spark.implicits._
    val probe = pairs.select(col("a"), col("b"))
      .limit(DriverFoldCap + 1).as[(Long, Long)].collect()
    if (probe.length > DriverFoldCap) return None
    // index nodes; deg(v) = #pairs containing v (both endpoint
    // aggregates merged — a self-pair counts twice, as distributed)
    val idx = new java.util.HashMap[java.lang.Long, Integer]()
    def id(n: Long): Int = {
      val got = idx.get(n)
      if (got != null) got.intValue()
      else { val i = idx.size(); idx.put(n, i); i }
    }
    val m = probe.length
    val srcA = new Array[Int](2 * m); val dstA = new Array[Int](2 * m)
    var i = 0
    while (i < m) {
      val (a, b) = probe(i)
      val ia = id(a); val ib = id(b)
      srcA(2 * i) = ia; dstA(2 * i) = ib
      srcA(2 * i + 1) = ib; dstA(2 * i + 1) = ia
      i += 1
    }
    val n = idx.size()
    if (n == 0)
      return Some(spark.createDataFrame(Seq.empty[PrRank]))
    val deg = new Array[Long](n)
    i = 0
    while (i < m) {
      val (a, b) = probe(i)
      deg(idx.get(a).intValue()) += 1L; deg(idx.get(b).intValue()) += 1L
      i += 1
    }
    val teleport = (15L * Mass) / (100L * n)
    var rank = Array.fill(n)(Mass / n)
    var round = 0
    while (round < k) {
      val share = new Array[Long](n)
      var u = 0
      while (u < n) {
        if (deg(u) > 0L) share(u) = (85L * rank(u)) / (100L * deg(u))
        u += 1
      }
      val next = Array.fill(n)(teleport)
      var e = 0
      while (e < 2 * m) {
        next(dstA(e)) += share(srcA(e))
        e += 1
      }
      rank = next
      round += 1
    }
    val out = new Array[PrRank](n)
    idx.forEach { (node, ix) =>
      out(ix.intValue()) = PrRank(node.longValue(), rank(ix.intValue())) }
    Some(spark.createDataFrame(out.toIndexedSeq))
  }

  /** [[personalizedSymmetric]] folded on the driver — the weighted,
    * seeded twin of [[driverRanksSymmetric]]. Both the pair list and
    * the seed set must fit [[DriverFoldCap]] (each probed with one
    * bounded limit(cap+1) job); otherwise None.
    */
  private def driverPersonalizedSymmetric(pw: DataFrame, seeds: DataFrame,
                                          k: Int): Option[DataFrame] = {
    if (!longCols(pw, "a", "b", "w") || !longCols(seeds, "node")) return None
    val spark = pw.sparkSession
    import spark.implicits._
    val probe = pw.select(col("a"), col("b"), col("w"))
      .limit(DriverFoldCap + 1).as[(Long, Long, Long)].collect()
    if (probe.length > DriverFoldCap) return None
    val seedArr = seeds.select(col("node")).distinct()
      .limit(DriverFoldCap + 1).as[Long].collect()
    if (seedArr.length > DriverFoldCap) return None
    val idx = new java.util.HashMap[java.lang.Long, Integer]()
    def id(n: Long): Int = {
      val got = idx.get(n)
      if (got != null) got.intValue()
      else { val i = idx.size(); idx.put(n, i); i }
    }
    val m = probe.length
    val srcA = new Array[Int](2 * m); val dstA = new Array[Int](2 * m)
    val wA = new Array[Long](2 * m)
    var i = 0
    while (i < m) {
      val (a, b, w) = probe(i)
      val ia = id(a); val ib = id(b)
      srcA(2 * i) = ia; dstA(2 * i) = ib; wA(2 * i) = w
      srcA(2 * i + 1) = ib; dstA(2 * i + 1) = ia; wA(2 * i + 1) = w
      i += 1
    }
    val n = idx.size()
    val tw = new Array[Long](n)
    i = 0
    while (i < m) {
      val (a, b, w) = probe(i)
      tw(idx.get(a).intValue()) += w; tw(idx.get(b).intValue()) += w
      i += 1
    }
    // in-graph seeds only (out-of-graph seeds can never hold mass)
    val seed = new Array[Boolean](n)
    var ns = 0L
    seedArr.foreach { sNode =>
      val got = idx.get(sNode)
      if (got != null && !seed(got.intValue())) {
        seed(got.intValue()) = true; ns += 1
      }
    }
    if (ns == 0L) {
      // no in-graph seed: every rank is exactly 0 for any k — the same
      // closed form the distributed path returns
      val out = new Array[PrRank](n)
        idx.forEach { (node, ix) =>
        out(ix.intValue()) = PrRank(node.longValue(), 0L) }
      return Some(spark.createDataFrame(out.toIndexedSeq))
    }
    val teleport = (15L * Mass) / (100L * ns)
    val r0 = Mass / ns
    var rank = Array.tabulate(n)(v => if (seed(v)) r0 else 0L)
    var round = 0
    while (round < k) {
      // pre-divided numerator/denominator exactly as distributed:
      // c(u→v) = (85·r(u)·w) div (100·tw(u)) via the identical long
      // product and floor division
      // exact-arithmetic parity with the ANSI distributed path: every
      // product/sum there (85*rank, 100*Σw, r85*w, the contribution
      // SUM) throws ArithmeticException on Long overflow under Spark 4
      // ANSI mode, so the fold must throw at exactly the same points
      // instead of silently wrapping (ADVICE r16). multiplyExact /
      // addExact are JIT intrinsics — no measurable cost in this loop.
      val r85 = new Array[Long](n)
      val tw100 = new Array[Long](n)
      var u = 0
      while (u < n) {
        r85(u) = Math.multiplyExact(85L, rank(u))
        tw100(u) = Math.multiplyExact(100L, tw(u))
        u += 1
      }
      val next = Array.tabulate(n)(v => if (seed(v)) teleport else 0L)
      var e = 0
      while (e < 2 * m) {
        val su = srcA(e)
        if (tw(su) > 0L) {
          val d = dstA(e)
          next(d) = Math.addExact(next(d),
            Math.multiplyExact(r85(su), wA(e)) / tw100(su))
        }
        e += 1
      }
      rank = next
      round += 1
    }
    val out = new Array[PrRank](n)
    idx.forEach { (node, ix) =>
      out(ix.intValue()) = PrRank(node.longValue(), rank(ix.intValue())) }
    Some(spark.createDataFrame(out.toIndexedSeq))
  }
}
