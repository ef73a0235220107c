package graft.ops

import graft.functions.VectorFunctions.{dotProduct, squaredNorm}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact embedding near-duplicate pairs at scale (SURVEY.md §2.11 E2/E3):
  * spherical-cap candidate pruning + a blocked exact-rescore kernel.
  *
  * The problem: emit every unordered pair with cosine ≥ threshold. A naive
  * self-join scores all O(n²) pairs row-by-row — the job that never
  * finishes at corpus scale. Probabilistic LSH cannot replace it here
  * without changing semantics: at thresholds near the corpus's background
  * similarity the hyperplane-LSH exponent ρ = ln p1/ln p2 approaches 1,
  * so guaranteed recall costs as much as brute force. This operator stays
  * EXACT and attacks both real costs instead:
  *
  *  1. Candidate pruning (communication): vectors are partitioned into
  *     coarse sign-buckets; each bucket gets a centroid and an angular
  *     radius r = max angle(member, centroid). For buckets A, B the
  *     spherical triangle inequality gives angle(a,b) ≥ angle(cA,cB) −
  *     rA − rB for all members, so a bucket PAIR whose best-case angle
  *     exceeds arccos(threshold) can be dropped WITHOUT scoring — no
  *     false negatives, by construction. Clustered corpora (the real
  *     near-dup workload) prune most bucket pairs; an adversarially
  *     uniform corpus prunes nothing and degrades to exact blocked
  *     all-pairs, which is the information-theoretic floor for exact
  *     results on such data.
  *  2. Blocked rescore (compute): surviving buckets are split into
  *     ~targetBlock-row blocks; each surviving block pair is scored in
  *     one task by a tight primitive loop over the two blocks' vectors
  *     (the GEMM-shaped kernel), instead of materializing one joined row
  *     per candidate pair through the expression evaluator. Shuffled
  *     bytes are O(n·d·m) for m surviving partner blocks, not O(n²).
  *
  * The kernel sums a·b left-to-right exactly like the codegen'd
  * `DotProduct` expression, so results are bit-identical to the scored
  * self-join it replaces.
  */
object CosineDedup {

  /** Per-bucket stats collected to the driver: member count, mean vector
    * (not normalized), and min cosine(member, centroid) — the cap radius
    * in cosine form.
    */
  final case class BucketStat(bucket: Int, n: Long, centroid: Array[Double], minCos: Double)

  /** Deterministic Gaussian hyperplanes for the coarse sign-bucketing. */
  private[graft] def signPlanes(dim: Int, bits: Int, seed: Long): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  private def bucketExpr(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (h, j) =>
      when(dotProduct(v, typedLit(h.toSeq)) > 0d, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Driver-side cap stats for each non-empty sign-bucket of `e`
    * (columns: vec_id, v: array<double>, n2: double).
    */
  private[graft] def bucketStats(e: DataFrame, planes: Array[Array[Double]]): Array[BucketStat] =
    statsFromAssigned(e.withColumn("bucket", bucketExpr(col("v"), planes)))

  /** Two driver-coordinated passes over the assigned frame: (1) one
    * aggregation yields per-(bucket, dim) means, assembled into centroids
    * on the driver (nBuckets·dim tiny rows); (2) one aggregation against
    * the centroids as CASE literals yields count + min member cosine (the
    * cap radius). Centroid norms are precomputed driver-side, so pass 2
    * is a single codegen'd dot product per row.
    *
    * Degenerate inputs: callers filter n2 > 0 before assignment (a zero
    * vector has no cosine to anything and can never emit a pair), but a
    * bucket's MEAN can still be the zero vector for symmetric members —
    * that makes the cos_c divisor 0, which Spark 4's default ANSI mode
    * turns into a query-killing DIVIDE_BY_ZERO. The divisor is
    * null-guarded (null cos_c rows drop out of min()) and an all-null
    * bucket falls back to minCos = -1: a full-sphere cap radius that
    * [[survivingBucketPairs]] can never prune — correctness preserved,
    * only pruning power lost on the degenerate bucket.
    */
  private def statsFromAssigned(assigned: DataFrame): Array[BucketStat] = {
    val centRows = assigned
      .select(col("bucket"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("bucket"), col("i")).agg(avg(col("x")).as("m"))
      .collect()
    val centroids: Map[Int, Array[Double]] = centRows
      .groupBy(_.getInt(0))
      .map { case (b, rs) => b -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    def caseOver(f: Array[Double] => Column): Column =
      centroids.foldLeft(lit(null).cast("double")) { case (acc, (b, cv)) =>
        when(col("bucket") === b, f(cv)).otherwise(acc)
      }
    val denom = sqrt(col("n2") * caseOver(cv => lit(cv.map(x => x * x).sum)))
    val cosC = when(denom === 0d, lit(null).cast("double"))
      .otherwise(caseOver(cv => dotProduct(col("v"), typedLit(cv.toSeq))) / denom)
    assigned.withColumn("cos_c", cosC)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("cos_c")).as("min_cos"))
      .collect()
      .map(r => BucketStat(r.getInt(0), r.getLong(1),
        centroids(r.getInt(0)),
        if (r.isNullAt(2)) -1d else r.getDouble(2)))
  }

  private def clampAcos(x: Double): Double = math.acos(math.max(-1d, math.min(1d, x)))

  /** Bucket pairs (i ≤ j over bucket ids) that can possibly hold a pair
    * at or above `threshold`: angle(cA,cB) − rA − rB ≤ arccos(threshold).
    * Complete by the spherical triangle inequality — dropping any other
    * pair cannot lose a qualifying vector pair.
    */
  private[graft] def survivingBucketPairs(
      stats: Array[BucketStat], threshold: Double): Seq[(Int, Int)] = {
    val tAngle = clampAcos(threshold)
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0d; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byId = stats.sortBy(_.bucket)
    for {
      (a, ia) <- byId.zipWithIndex.toSeq
      b <- byId.drop(ia)
      nProd = norm(a.centroid) * norm(b.centroid)
      // a zero-norm centroid has no angle to anything: the cap bound is
      // vacuous, so the pair must SURVIVE (pruning it would be a silent
      // false negative — the pre-fix behavior, where the NaN bound
      // failed the <= and dropped the pair)
      bound = if (nProd == 0d) Double.NegativeInfinity
              else clampAcos(dot(a.centroid, b.centroid) / nProd) -
                clampAcos(a.minCos) - clampAcos(b.minCos)
      if bound <= tAngle + 1e-12
    } yield (a.bucket, b.bucket)
  }

  /** Hard ceiling on the input row count (overridable per call). The
    * operator's WORST CASE is exact blocked all-pairs — O(n²) kernel
    * work when the cap bound prunes nothing (adversarially uniform
    * corpora) — and the round-7 sf1→sf10 measurements show the
    * quadratic term is real (31.7× / 24.1× cost per 10× rows). The
    * guard makes the exact path an explicit decision instead of a
    * footgun: at corpus scale, route through the cluster-scoped
    * q106_semantic_dedup or the banded q129 MinHash prefilter and
    * reserve this operator for verifying their candidates on bounded
    * panels.
    */
  val DefaultMaxRows: Long = 2L * 1000 * 1000

  /** All unordered pairs of `e`'s vectors with round(cosine, 4) ≥
    * threshold, as (vec_a, vec_b, cos_r) with vec_a < vec_b. Exact — no
    * false negatives at any corpus shape.
    *
    * Refuses inputs above `maxRows` (see [[DefaultMaxRows]]): this is
    * the exact-verification twin of the q106/q129 approximate paths,
    * quadratic by design, and must not be invokable by accident on a
    * corpus-scale table. Callers that really want a bigger exact run
    * pass maxRows explicitly.
    */
  def pairsAbove(
      e: DataFrame,
      threshold: Double,
      dim: Int,
      signBits: Int = 3,
      targetBlock: Int = 512,
      seed: Long = 7L,
      maxRows: Long = DefaultMaxRows): DataFrame = {

    val nRows = e.count()
    require(nRows <= maxRows,
      s"CosineDedup.pairsAbove: input has $nRows rows > maxRows=$maxRows. " +
        "This operator is the EXACT quadratic verification path; at this " +
        "scale run the cluster-scoped prefilter (q106_semantic_dedup) or " +
        "the banded MinHash-LSH path (q129) and rescore only their " +
        "candidates, or pass maxRows explicitly to override.")
    val planes = signPlanes(dim, signBits, seed)
    // Compute the bucket assignment once and truncate lineage so the two
    // stats passes and the block build share one materialization (at
    // cluster scale: persist(DISK) or recompute — the assignment is one
    // narrow map over the scan). Zero-norm rows are dropped up front:
    // cosine to a zero vector is undefined (0/0), so such a row can
    // never emit a pair — and letting it reach the cap-stat pass turns
    // the n2=0 divisor into an ANSI DIVIDE_BY_ZERO that kills the query.
    val assigned = e.where(col("n2") > 0d)
      .withColumn("bucket", bucketExpr(col("v"), planes))
      .localCheckpoint(false)
    val stats = statsFromAssigned(assigned)
    val survivors = survivingBucketPairs(stats, threshold)

    // Sub-split buckets into ~targetBlock-row blocks so one block pair is
    // one task-sized unit of kernel work regardless of bucket skew.
    val nSubs: Map[Int, Int] =
      stats.map(s => s.bucket -> math.max(1, math.ceil(s.n.toDouble / targetBlock).toInt)).toMap
    val subExpr = nSubs.foldLeft(lit(0)) { case (acc, (b, m)) =>
      when(col("bucket") === b, pmod(xxhash64(col("vec_id")), lit(m.toLong)).cast("int"))
        .otherwise(acc)
    }
    val blocks = assigned
      .withColumn("sub", subExpr)
      .groupBy(col("bucket"), col("sub"))
      .agg(collect_list(struct(col("vec_id"), col("v"), col("n2"))).as("items"))

    val blockPairs = survivors.flatMap { case (ba, bb) =>
      for {
        sa <- 0 until nSubs(ba)
        sb <- 0 until nSubs(bb)
        if ba < bb || sa <= sb
      } yield (ba, sa, bb, sb)
    }
    val spark = e.sparkSession
    import spark.implicits._
    val pairsDf = blockPairs.toDF("ba", "sa", "bb", "sb")

    val joined = blocks.as("A")
      .join(broadcast(pairsDf), col("A.bucket") === col("ba") && col("A.sub") === col("sa"))
      .join(blocks.as("B"), col("B.bucket") === col("bb") && col("B.sub") === col("sb"))
      .select(col("A.items").as("ia"), col("B.items").as("ib"),
              (col("ba") === col("bb") && col("sa") === col("sb")).as("same"))

    scoreBlocks(joined, dim, threshold)
  }

  /** The blocked exact-rescore kernel shared by [[pairsAbove]] and the
    * cluster-scoped [[pairsAboveAuto]] route: each input row is one
    * block pair (`ia`, `ib`, `same`); a tight primitive loop scores
    * every cross pair and emits (vec_a, vec_b, cos_r) at 4-dp ≥
    * threshold. Emits slightly below threshold so 4-dp HALF_UP rounding
    * at the edge is decided by the SQL filter, not the kernel.
    */
  private def scoreBlocks(joined: DataFrame, dim: Int,
                          threshold: Double): DataFrame = {
    val spark = joined.sparkSession
    import spark.implicits._
    val emitFloor = threshold - 1e-4
    val scored = joined.flatMap { row =>
      def decode(i: Int): Array[(Long, Array[Double], Double)] =
        row.getSeq[Row](i).map(r =>
          (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2))).toArray
      val a = decode(0)
      val same = row.getBoolean(2)
      val b = if (same) a else decode(1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      var i = 0
      while (i < a.length) {
        val (idA, va, n2a) = a(i)
        var j = if (same) i + 1 else 0
        while (j < b.length) {
          val (idB, vb, n2b) = b(j)
          if (idA != idB) {
            var s = 0d; var k = 0
            while (k < dim) { s += va(k) * vb(k); k += 1 }
            val cos = s / math.sqrt(n2a * n2b)
            if (cos >= emitFloor)
              out += (if (idA < idB) (idA, idB, cos) else (idB, idA, cos))
          }
          j += 1
        }
        i += 1
      }
      out
    }.toDF("vec_a", "vec_b", "cos")

    scored
      .withColumn("cos_r", round(col("cos"), 4))
      .where(col("cos_r") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos_r"))
  }

  /** [[pairsAbove]] that runs at ANY scale instead of refusing: at or
    * below `maxRows` it IS the exact operator; above, it routes through
    * the q106-style two-level seeded quantizer (adaptive k = n/2500,
    * zero-exchange broadcast-fold assignment) and exact-verifies only
    * WITHIN each cluster — the SemDeDup shape with this operator's
    * blocked kernel as the verifier.
    *
    * Semantics of the routed path: results are a SUBSET of the exact
    * pair set (identical cos_r on every emitted pair — same kernel);
    * pairs BOTH of whose endpoints rank the shared cell below their
    * top-2 are missed. Round 9 measured 0.381 pair recall under
    * single-assignment on the planted-cluster fixture; routing each
    * vector to its TOP-2 fine cells (assignTwoLevelTop2 — the
    * IVF-multi-probe trick applied to the assignment side) heals the
    * border: a split pair is recovered whenever either endpoint's
    * runner-up cell is the other's cell. The price is ~4× kernel work
    * (each cell's population doubles) — ~n·5000, still linear where
    * exact all-pairs is n²/2 — plus a pair-level dedup for pairs
    * co-located in both shared cells. CosineDedupSpec measures the
    * recall on the planted-cluster fixture. Callers needing
    * guaranteed-complete pairs at scale keep the explicit maxRows
    * override and pay the quadratic.
    */
  def pairsAboveAuto(
      e: DataFrame,
      threshold: Double,
      dim: Int,
      signBits: Int = 3,
      targetBlock: Int = 512,
      routedBlock: Int = 2500,
      seed: Long = 7L,
      maxRows: Long = DefaultMaxRows): DataFrame = {
    val nRows = e.count()
    if (nRows <= maxRows)
      return pairsAbove(e, threshold, dim, signBits, targetBlock, seed, maxRows)

    val k = graft.queries.SelectionOps.adaptiveK(nRows)
    // same zero-norm semantics as the exact leg: a zero vector joins no
    // cluster and emits no pair (it would only waste a kernel slot —
    // its NaN cosines can never clear the threshold)
    val assigned = graft.queries.SelectionOps
      .assignTwoLevelTop2(e.where(col("n2") > 0d), k)
      .localCheckpoint(false)
    // top-2 multi-assignment can co-locate the same pair in BOTH shared
    // cells; cos_r is a pure function of the pair (same kernel), so the
    // dedup never has to pick between conflicting rows. The routed
    // path's block size is its OWN knob (routedBlock): targetBlock
    // tunes the sub-guard exact path, where 512 is the measured
    // optimum; above the guard, Σc² shuffle volume dominates and 2500
    // is (round-11 sf100 measurement: ~60 GB shipped at 512, ~¼ at
    // ≥2500). Callers bound per-task memory by passing routedBlock
    // explicitly — it is honored verbatim, no silent floor.
    pairsWithinBuckets(assigned, dim, threshold, routedBlock)
      .dropDuplicates("vec_a", "vec_b")
  }

  /** All within-bucket pairs of `assigned` (bucket, vec_id, v, n2) with
    * round(cosine, 4) ≥ threshold, via the blocked exact kernel —
    * (vec_a, vec_b, cos_r), vec_a < vec_b; rows may repeat if the input
    * multi-assigns a vector to several buckets (callers dedup to their
    * need). Shared by [[pairsAboveAuto]]'s routed path and the
    * cluster-scoped q106 witness join: one block-pair row replaces
    * ~targetBlock² joined rows through the expression evaluator, the
    * same ~5× that motivated the kernel in [[pairsAbove]].
    *
    * Block size: every block is SHIPPED once per partner block, so the
    * block-pair join's shuffle volume is Σ_cells m_i² × |block bytes|
    * ∝ Σc_i² / B — bigger blocks shed shuffle linearly while the
    * per-task kernel cost grows only to B²/2 cosines (~3M at the
    * default 2500: a fine task grain, ~1.4 MB of block payload). At
    * the sf100 rung B=512 shipped ~60 GB of block arrays (disk-bound,
    * the 14.8×/decade leg of round 10); B=2500 — one block per mean
    * cell-half under adaptive k — ships ~4×. Pure physical
    * partitioning: the pair set and every cos_r are unchanged, so
    * oracle replays are untouched. targetBlock is honored VERBATIM
    * (no silent floor): a caller bounding per-task memory with a
    * smaller block gets it, and pays the shuffle volume knowingly.
    */
  private[graft] def pairsWithinBuckets(
      assigned: DataFrame, dim: Int, threshold: Double,
      targetBlock: Int = 2500): DataFrame = {
    val blockSize = math.max(targetBlock, 1)
    // per-cluster sub-block counts: k ∝ n/2500 rows — joined back (not a
    // driver-built when-chain, which would not scale past a few dozen
    // buckets) so the plan shape survives corpus-scale k
    val counts = assigned.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("m", greatest(lit(1L),
        ceil(col("n").cast("double") / blockSize).cast("long")).cast("int"))
      .select(col("bucket"), col("m"))
    val blocks = assigned.join(counts, Seq("bucket"))
      .withColumn("sub", pmod(xxhash64(col("vec_id")), col("m")).cast("int"))
      .groupBy(col("bucket"), col("sub"))
      .agg(collect_list(struct(col("vec_id"), col("v"), col("n2"))).as("items"))
    // within-cluster block pairs (sa <= sb), generated distributed
    val pairsDf = counts
      .select(col("bucket"), col("m"),
        explode(sequence(lit(0), col("m") - 1)).as("sa"))
      .select(col("bucket"), col("sa"),
        explode(sequence(col("sa"), col("m") - 1)).as("sb"))
    val joined = blocks.as("A")
      .join(pairsDf.as("P"),
        col("A.bucket") === col("P.bucket") && col("A.sub") === col("P.sa"))
      .join(blocks.as("B"),
        col("B.bucket") === col("P.bucket") && col("B.sub") === col("P.sb"))
      .select(col("A.items").as("ia"), col("B.items").as("ib"),
        (col("P.sa") === col("P.sb")).as("same"))
    scoreBlocks(joined, dim, threshold)
  }
}
