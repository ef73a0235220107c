package graft

import graft.functions.VectorFunctions.{dotProduct, squaredNorm}
import graft.queries.{Registry, SelectionOps, VectorOps}
import org.apache.spark.sql.functions._

/** Evidence for the round-4 data-selection operators beyond the DuckDB
  * oracle rows: q106's drop-witness validity and exact-pair containment
  * (quantifying the cluster-border recall trade), and q107's
  * hand-checked conditional bit costs, no-evidence guard, and
  * broadcast-LM plan shape.
  */
class SelectionOpsSpec extends SparkSpec {

  private def embFrame = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .withColumn("n2", squaredNorm(col("v")))

  test("q106: every drop has an in-bucket lower-id witness at >= 0.45") {
    val out = Registry.byName("q106_semantic_dedup").run(spark, sfDir)
    val dropped = out.where(col("keep") === 0).select(col("vec_id"))
    // both outcomes occur on the fixture
    assert(out.where(col("keep") === 1).count() > 0 && dropped.count() > 0)
    val assigned = SelectionOps.q106Assign(embFrame)
    val a = assigned.select(col("bucket"), col("vec_id").as("a_id"),
      col("v").as("av"), col("n2").as("an2"))
    val witnessed = assigned.join(dropped, Seq("vec_id"))
      .join(a, Seq("bucket"))
      .where(col("a_id") < col("vec_id") &&
        round(dotProduct(col("v"), col("av")) /
          sqrt(col("n2") * col("an2")), 4) >= 0.45)
      .select(col("vec_id")).distinct()
    assert(witnessed.count() == dropped.count(),
      "a dropped vector lacks a same-bucket lower-id witness")
  }

  test("q106: cluster-scoped drops are a subset of the exact pair b-sides") {
    // exact all-pairs >= 0.45 (test-only brute force, 500 vecs)
    val e = embFrame
    val b = e.select(col("vec_id").as("b_id"), col("v").as("bv"),
      col("n2").as("bn2"))
    val exactPairs = e.crossJoin(b)
      .where(col("vec_id") < col("b_id"))
      .where(round(dotProduct(col("v"), col("bv")) /
        sqrt(col("n2") * col("bn2")), 4) >= 0.45)
      .select(col("vec_id").as("a_id"), col("b_id"))
    val exactDropSides = exactPairs.select(col("b_id").as("vec_id")).distinct()
    val out = Registry.byName("q106_semantic_dedup").run(spark, sfDir)
    val dropped = out.where(col("keep") === 0).select(col("vec_id"))
    // containment: the approximate pass never drops a vector the exact
    // pass wouldn't (cluster scoping only LOSES pairs, never invents)
    assert(dropped.join(exactDropSides, Seq("vec_id"), "left_anti").count() == 0)
    // and the recall trade is real on this fixture: strictly fewer
    // dropped than the exact b-sides (pairs split across cluster
    // borders are missed — the documented SemDeDup cost)
    assert(dropped.count() < exactDropSides.count())
  }

  test("q106: two-level assignment routes through the vector's top-2 super-cells") {
    // hierarchy consistency: a vector's bucket must be a centroid that
    // itself maps to one of the vector's TWO probed super-cells — the
    // structural invariant that makes the N·3√k assignment a real
    // restriction of the flat argmax (and the property the DuckDB
    // oracle replays via CTEs)
    val e = embFrame
    val k = SelectionOps.adaptiveK(e.count())
    val k1 = SelectionOps.superK(k)
    assert(k1 >= 1 && k1 * k1 <= k)
    val cent = e.where(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"),
        col("n2").as("cn2"))
    val sup = cent.where(col("c_id") < k1)
      .select(col("c_id").as("s_id"), col("cv").as("sv"),
        col("cn2").as("sn2"))
    // independent top-2 super ranking via the window formulation (the
    // slow exploded path the fold-based operator replaced)
    val vSup2 = e.crossJoin(sup)
      .withColumn("cs", round(
        graft.functions.VectorFunctions.dotProduct(col("v"), col("sv")) /
          sqrt(col("n2") * col("sn2")), 4))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("cs").desc, col("s_id"))))
      .where(col("rn") <= 2)
      .select(col("vec_id"), col("s_id").as("vcell"))
    // each centroid's cell via the flat helper on renamed frames
    val cSup = SelectionOps.assignWith(
      cent.select(col("c_id").as("vec_id"), col("cv").as("v"),
        col("cn2").as("n2")),
      sup.select(col("s_id").as("c_id"), col("sv").as("cv"),
        col("sn2").as("cn2")))
      .select(col("vec_id").as("bucket"),
        when(col("vec_id") < k1, col("vec_id")).otherwise(col("bucket"))
          .as("ccell"))
    val asg = SelectionOps.q106Assign(e)
    // bucket's cell must appear among the vector's two probed cells
    val viol = asg.join(cSup, Seq("bucket"))
      .join(vSup2, Seq("vec_id"), "left_semi")
      .count()
    val inProbe = asg.join(cSup, Seq("bucket"))
      .join(vSup2.withColumnRenamed("vcell", "ccell"),
        Seq("vec_id", "ccell"), "left_semi")
      .count()
    assert(viol == inProbe,
      s"${viol - inProbe} vectors bucketed outside their top-2 super-cells")
    assert(viol == e.count())
    // and every super-cell owns at least its self-assigned centroid
    val cells = cSup.select(col("ccell")).distinct().count()
    assert(cells == k1, s"$cells non-empty super-cells, expected $k1")
  }

  test("q106: two-level assignment degrades to single-probe with < 2 super-cells") {
    import spark.implicits._
    // Two degenerate shapes, both leaving ONE super-cell so top2Of's
    // second probe has no target (i2 = Long.MaxValue): k1 = 1 (k = 3),
    // and a corpus missing the low seed ids (vec_ids 1, 2 absent with
    // k1 = 3). The r8 inner join on s2 silently dropped every vector
    // here; the left probe must instead fall back to b1 — which in
    // both shapes is the flat argmax over all centroids, since the
    // single cell owns every one of them.
    val rnd = new scala.util.Random(7)
    def frame(ids: Seq[Long]) = ids.map(i => (i, Array.fill(4)(rnd.nextGaussian())))
      .toDF("vec_id", "v")
      .withColumn("n2", graft.functions.VectorFunctions.squaredNorm(col("v")))
    for ((ids, k) <- Seq((0L until 20L, 3L),
                         (Seq(0L) ++ (3L until 21L), 9L))) {
      val e = frame(ids.toSeq)
      val two = SelectionOps.assignTwoLevel(e, k)
        .select(col("vec_id"), col("bucket")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(two.size == ids.size, s"k=$k: ${two.size} of ${ids.size} assigned")
      val cent = e.where(col("vec_id") < k)
        .select(col("vec_id").as("c_id"), col("v").as("cv"),
          col("n2").as("cn2"))
      val flat = SelectionOps.assignWith(e, cent)
        .select(col("vec_id"), col("bucket")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(two == flat, s"k=$k: single-cell degrade differs from flat argmax")
    }
  }

  test("q106: top-2 routing's cell balance stays within bounds of the flat argmax") {
    // The doc-comment claim (SelectionOps two-level scaladoc): probing
    // the top-2 super-cells keeps the fine cells balanced under the
    // seeded quantizer — measured at sf10 as max cell 6,710 vs flat
    // 3,048 and Σc² 606M vs 503M (top-1 routing: 12,480 / 941M).
    // Pin the property on the fixture with a real hierarchy (k = 100,
    // k1 = 10 — NOT the k = 8 degenerate where both routes coincide).
    val e = embFrame
    val k = 100L
    def cellStats(asg: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val c = asg.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      val row = c.agg(max(col("n")).as("mx"),
        sum(col("n") * col("n")).as("s2")).collect().head
      (row.getLong(0), row.getLong(1))
    }
    val (mx2, s2two) = cellStats(SelectionOps.assignTwoLevel(e, k))
    val cent = e.where(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("n2").as("cn2"))
    val (mxF, s2flat) = cellStats(SelectionOps.assignWith(e, cent))
    info(s"max cell two-level=$mx2 flat=$mxF; sum-c2 two-level=$s2two flat=$s2flat")
    // thresholds: 2.2x / 1.2x measured at sf10, with headroom for the
    // smaller fixture's noise — regression here means the routing lost
    // its balance property (e.g. someone reverts to top-1)
    assert(mx2 <= 3 * mxF, s"max cell $mx2 vs flat $mxF: balance lost")
    assert(s2two <= 2 * s2flat, s"sum-c2 $s2two vs flat $s2flat: balance lost")
  }

  test("q107: hand-checked conditional bit costs and no-evidence guard") {
    import spark.implicits._
    // corpus: d1 "a b a b", d2 "x" (no bigram), d3 "a c"
    // bigrams: (a,b)x2, (b,a)x1, (a,c)x1; contexts: a->3, b->1
    // bits(a,b) = floor(log2(3 div 2)) = 0; bits(b,a) = 0
    // bits(a,c) = floor(log2(3 div 1)) = 1
    val docs = Seq((1L, "a b a b"), (2L, "x"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = SelectionOps.bigramGate(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, 3L, 0L, 1L)))
    assert(out(1) == ((2L, 0L, 0L, 1L))) // no evidence -> pass
    assert(out(2) == ((3L, 1L, 1L, 1L)))
  }

  test("q107: both gate outcomes occur; boilerplate repetition scores cheap") {
    import spark.implicits._
    val out = Registry.byName("q107_bigram_ppl_gate").run(spark, sfDir)
    val n = out.count()
    val pass = out.where(col("ppl2_pass") === 1).count()
    assert(pass > 0 && pass < n, s"degenerate gate: $pass/$n")
    // a doc that is one transition repeated costs ~0 bits/bigram under
    // the corpus LM extended with it — the signal that separates
    // boilerplate from organic text. Score a within-corpus-style check:
    // train on fixture docs PLUS a planted loop doc; the loop doc's
    // mean bits must sit far below the corpus mean.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .union(Seq((100000L, Array.fill(40)("loop loop").mkString(" ")))
        .toDF("doc_id", "text"))
    val scored = SelectionOps.bigramGate(docs)
      .withColumn("mean100", expr("(sum_bits2 * 100) div n_big"))
    val loopMean = scored.where(col("doc_id") === 100000L)
      .collect().head.getAs[Long]("mean100")
    val corpusMean = scored.where(col("doc_id") < 100000L)
      .agg(avg(col("mean100"))).collect().head.getDouble(0)
    assert(loopMean < corpusMean / 4,
      s"loop doc mean100=$loopMean vs corpus mean=$corpusMean")
  }

  test("q107: LM joins broadcast; no window over the corpus") {
    val plan = Registry.byName("q107_bigram_ppl_gate").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))
  }

  test("q110: MMR picks are valid, start at argmax rel, and beat top-k diversity") {
    val out = Registry.byName("q110_mmr_select").run(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 10L))
    val ids = out.map(_.getLong(1))
    assert(ids.distinct.length == 10 && !ids.contains(0L))
    // rank 1 is the pure-relevance argmax over the REGISTERED candidate
    // frame (the query's IVF cell cut to top-100 — round-5 bounding)
    val e = embFrame
    val qv = e.where(col("vec_id") === 0)
      .select(col("v").as("qv"), col("n2").as("qn2"))
    val rel = SelectionOps.mmrCandidates(e, 100)
      .where(col("vec_id") >= 1).crossJoin(broadcast(qv))
      .withColumn("rel",
        round(dotProduct(col("v"), col("qv")) / sqrt(col("n2") * col("qn2")), 4))
    val top = rel.orderBy(desc("rel"), col("vec_id")).limit(10)
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(out.head.getLong(1) == top.head)
    assert(out.head.getDouble(2) == out.head.getDouble(3))
    // the redundancy penalty buys measurable diversity: max pairwise
    // cosine within the MMR set is strictly below the pure top-k set's.
    // Asserted on the corpus-wide operator (the spec form): within the
    // registered single-cell candidate pool the two sets can tie on
    // this fixture, which is exactly why the property is the
    // operator's, not the bounding rule's.
    def maxPairSim(idSet: Seq[Long]): Double = {
      val sub = e.where(col("vec_id").isin(idSet: _*))
      val b = sub.select(col("vec_id").as("b_id"), col("v").as("bv"),
        col("n2").as("bn2"))
      sub.crossJoin(b).where(col("vec_id") < col("b_id"))
        .select(max(round(dotProduct(col("v"), col("bv")) /
          sqrt(col("n2") * col("bn2")), 4)).as("m"))
        .collect().head.getDouble(0)
    }
    val wide = SelectionOps.mmrSelect(spark, e, 10).collect().map(_.getLong(1))
    val wideTop = e.where(col("vec_id") >= 1).crossJoin(broadcast(qv))
      .withColumn("rel",
        round(dotProduct(col("v"), col("qv")) / sqrt(col("n2") * col("qn2")), 4))
      .orderBy(desc("rel"), col("vec_id")).limit(10)
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(maxPairSim(wide.toSeq) < maxPairSim(wideTop.toSeq))
  }

  test("q110: registered candidates are bounded to the query's cell top-N") {
    val e = embFrame
    val corpus = e.count()
    // the bounded frame: at most N candidates + the query row, strictly
    // smaller than the corpus — per-pick work scans N rows, never the
    // embedding table (the round-4 scale-killer)
    val cand = SelectionOps.mmrCandidates(e, 100)
    val nCand = cand.count()
    assert(nCand <= 101, s"candidate frame has $nCand rows")
    assert(nCand < corpus, s"candidates ($nCand) not bounded below corpus ($corpus)")
    // every candidate really lives in the query's seeded-IVF cell
    val asg = SelectionOps.assignSeeded(e)
    val qBucket = asg.where(col("vec_id") === 0)
      .select(col("bucket")).collect().head.getLong(0)
    val outside = cand.where(col("vec_id") >= 1)
      .join(asg.select(col("vec_id"), col("bucket")), Seq("vec_id"))
      .where(col("bucket") =!= qBucket).count()
    assert(outside == 0L)
    // and the candidate CUT is the top-N plan shape, not a window: the
    // per-pick loop then runs over a localCheckpoint'd frame of <= N rows
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("q73: grouped codebook training equals per-subspace kmeans") {
    // r16 optimization pin: the one-plan grouped Lloyd training must be
    // bit-equal, per subspace, to M separate kmeansCentroids calls
    val e = embFrame.where(col("n2") > 0d)
    val subDim = 16
    val grouped = VectorOps.kmeansCentroidsGrouped(
      e.select(col("vec_id"), explode(
          array((0 until 4).map(m => struct(lit(m).as("m"),
            expr(s"slice(v, ${m * subDim + 1}, $subDim)").as("v"))): _*))
          .as("ms"))
        .select(col("ms.m").as("m"), col("vec_id"), col("ms.v").as("v"))
        .withColumn("n2", squaredNorm(col("v"))),
      16, 1)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2))
      .toMap
    (0 until 4).foreach { m =>
      val em = e.select(col("vec_id"),
          expr(s"slice(v, ${m * subDim + 1}, $subDim)").as("v"))
        .withColumn("n2", squaredNorm(col("v")))
      val solo = VectorOps.kmeansCentroids(em, 16, 1).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(solo.keySet == grouped.keySet.collect {
        case (mm, c) if mm == m => c })
      solo.foreach { case (c, cv) =>
        assert(grouped((m, c)) == cv, s"m=$m c_id=$c") }
    }
  }

  test("q110: driver fold equals the distributed greedy rounds") {
    // r16 optimization pin: under MmrDriverCap mmrSelect folds on the
    // driver; every column of every pick (rank, id, rel, score — the
    // 4-dp rounded doubles included) must equal the distributed loop
    val e = embFrame
    val fast = SelectionOps.mmrSelect(spark, e, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val dist = SelectionOps.mmrSelectDistributed(spark, e, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(fast.toSeq == dist.toSeq)
    // and through the registered bounded-candidate composition
    val cand = SelectionOps.mmrCandidates(e, 100)
    val fastC = SelectionOps.mmrSelect(spark, cand, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val distC = SelectionOps.mmrSelectDistributed(spark, cand, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(fastC.toSeq == distC.toSeq)
  }

  test("q110: k beyond the candidate pool terminates with the picks made") {
    import spark.implicits._
    // 1 query (vec_id 0) + 3 candidates, k = 10: returns 3 ranks
    val tiny = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.9, 0.1)),
      (2L, Array(0.0, 1.0)), (3L, Array(0.5, 0.5)))
      .toDF("vec_id", "v")
      .withColumn("n2", graft.functions.VectorFunctions.squaredNorm(col("v")))
    val out = SelectionOps.mmrSelect(spark, tiny, k = 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(out.map(_.getLong(1)).distinct.length == 3)
  }

  test("q111 streaming IVF ingest equals the batch q86 index probe") {
    // the second batch's vectors are assigned against centroids pinned
    // by the first batch (they never co-exist in one micro-batch), so
    // row-for-row equality with the batch index proves the store
    // handoff, not just the assignment function
    val batch = Registry.byName("q86_ivf_seeded_ann").run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val streamed = Registry.byName("q111_ivf_stream").run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("q112: recall report is in range and detects real single-probe loss") {
    val out = Registry.byName("q112_ann_recall_report").run(spark, sfDir)
      .collect()
    assert(out.length == 10)
    out.foreach { r =>
      val c = r.getLong(1)
      assert(c >= 0 && c <= 3)
      assert(r.getLong(2) == c * 100 / 3)
    }
    val total = out.map(_.getLong(1)).sum
    // the report must carry signal in both directions: some exact
    // neighbors recovered, and genuine loss visible (nprobe=1 over 8
    // random-seeded cells cannot recover cross-cell neighbors on an
    // isotropic corpus — the measurement this query exists to surface)
    assert(total > 0 && total < 30, s"total common $total")
  }

  test("q113: recall at nprobe=2 dominates nprobe=1 per query and in total") {
    val r1 = Registry.byName("q112_ann_recall_report").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = Registry.byName("q113_ann_recall_nprobe2").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1.keySet == r2.keySet)
    // monotone: the probed set only grows, so the ladder cannot lose
    r1.keySet.foreach(q => assert(r2(q) >= r1(q), s"q$q: ${r2(q)} < ${r1(q)}"))
    // and the recovery is material on the fixture
    assert(r2.values.sum > r1.values.sum)
  }

  test("vec_sum equals posexplode ground truth and is partition-invariant") {
    import graft.functions.VectorAgg.vecSum
    val e = Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>").as("v"))
    def viaAgg(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.agg(vecSum(col("v"), 64).as("s"))
        .select(transform(col("s"), x => round(x, 6)).as("s"))
        .collect().head.getAs[scala.collection.Seq[Double]]("s").toSeq
    val a = viaAgg(e)
    assert(a.length == 64)
    assert(viaAgg(e.repartition(13)) == a)
    // ground truth: the 64x-row-inflation shape this aggregate replaces
    val truth = e
      .select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim")).agg(round(sum(col("x")), 6).as("s"))
      .orderBy(col("dim")).collect().map(_.getDouble(1)).toSeq
    assert(a == truth)
  }

  test("q115: mined pairs carry the right labels and full coverage") {
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Registry.byName("q115_hard_negatives").run(spark, sfDir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val qLabel = r.getLong(1)
      assert(qLabel == labels(r.getLong(0)))
      // positive: same label as the query; hard negative: different
      assert(!r.isNullAt(2) && labels(r.getLong(2)) == qLabel)
      assert(!r.isNullAt(4) && labels(r.getLong(4)) != qLabel)
      // neither role is the query itself; cosines are valid
      assert(r.getLong(2) != r.getLong(0) && r.getLong(4) != r.getLong(0))
      assert(math.abs(r.getDouble(3)) <= 1.0 && math.abs(r.getDouble(5)) <= 1.0)
    }
  }

  test("q116: every stratum hits its proportions exactly") {
    val out = Registry.byName("q116_stratified_split").run(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perLang = Tables.documents(spark, sfDir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val train = out((lang, "train")); val v = out((lang, "val"))
      val test = out((lang, "test"))
      assert(train == n * 8 / 10, s"$lang train $train of $n")
      assert(v == n * 9 / 10 - n * 8 / 10, s"$lang val $v of $n")
      assert(train + v + test == n)
    }
  }

  test("q117: z-scored corpus recentres to zero") {
    val out = Registry.byName("q117_embed_zscore").run(spark, sfDir)
    // per dimension the z-scores sum to 0, so the corpus-wide sum of
    // per-vector checksums must vanish (up to the 4-dp rounding dust)
    val total = out.agg(sum(col("z_sum"))).collect().head.getDouble(0)
    assert(math.abs(total) < 0.5, s"total $total")
    // and the transform really spread the components: min < 0 < max
    val row = out.agg(min(col("z_min")).as("a"), max(col("z_max")).as("b"))
      .collect().head
    assert(row.getDouble(0) < -1 && row.getDouble(1) > 1)
  }

  test("q119 kernel equals the pure-column fold formulation") {
    import graft.functions.PolyHash.polyHash
    val dim = 64
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val kernel = docs.select(col("doc_id"),
      graft.functions.ShingleKernel.featureHashVec(col("text"), dim).as("v"))
    // the O(dim)-per-token fold the kernel replaces — ground truth
    val fold = docs
      .select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= "").as("toks"))
      .withColumn("hs", transform(col("toks"), t =>
        struct((polyHash(t) % dim).cast("int").as("dim"),
          ((polyHash(t, 131) % 2) * 2 - 1).as("sign"))))
      .select(col("doc_id"), aggregate(
        col("hs"),
        array_repeat(lit(0L), dim),
        (acc, h) => transform(acc,
          (x, i) => x + when(h("dim") === i, h("sign")).otherwise(0L))).as("v"))
    assert(kernel.join(fold.withColumnRenamed("v", "w"), Seq("doc_id"))
      .where(col("v") =!= col("w")).count() == 0)
    assert(kernel.count() == 500)
  }

  test("q119: hand-checked hashed vector; plan is exchange-free") {
    // "a" -> codepoint 97: dim 97%64=33, sign (97%2)*2-1=+1
    // "b" -> codepoint 98: dim 34, sign (98%2)*2-1=-1
    // doc "a a b": v[33]=+2, v[34]=-1 -> nnz 2, l1 3,
    // checksum 2*(33+1) - 1*(34+1) = 33
    val out = Registry.byName("q119_feature_hash_embed").run(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(600))
    import spark.implicits._
    val docsDir = java.nio.file.Files.createTempDirectory("t_q119").toString
    Seq((1L, "a a b")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$docsDir/documents.parquet")
    val tiny = Registry.byName("q119_feature_hash_embed").run(spark, docsDir)
      .collect().head
    assert((tiny.getLong(0), tiny.getLong(1), tiny.getLong(2),
      tiny.getLong(3)) == ((1L, 2L, 3L, 33L)))
  }

  test("q122 streaming LM training equals the batch q107 gate row for row") {
    // the LM is trained from per-batch partial counts folded at read
    // time; equality with the batch gate proves the count handoff AND
    // that deriving c1 from the folded c2 loses nothing
    val batch = Registry.byName("q107_bigram_ppl_gate").run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val streamed = Registry.byName("q122_bigram_lm_stream").run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("q121: prefix sums are partition-count invariant and exact") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("n_tok"))
    def run(p: Int) = SelectionOps
      .tokenBudgetShards(spark, docs, budget = 2000L, nParts = p)
      .collect().map(_.toSeq).toSeq
    val a = run(8)
    // the result is a function of doc_id order alone: 1, 3, and 13
    // partitions place the phase boundary differently but must agree
    assert(run(1) == a && run(3) == a && run(13) == a)
    // exactness: the window formulation is the ground truth
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("doc_id")).rowsBetween(Long.MinValue, 0)
    val truth = docs.withColumn("cum_tok", sum(col("n_tok")).over(w))
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(a.map(r => (r(0), r(2))) == truth)
    // shards are non-decreasing and each closes at the token budget
    val shards = a.map(_(3).asInstanceOf[Long])
    assert(shards.zip(shards.tail).forall { case (x, y) => y >= x })
  }

  test("q141: DSIR selects the planted target-like docs on a skewed corpus") {
    import spark.implicits._
    // 6 target-like docs over one vocabulary (marked by "seed"), 12
    // background docs over a disjoint one: every target-vocab bucket's
    // weight is strongly positive and every background bucket's strongly
    // negative, so the top-6 by mean centibits must be exactly the
    // target-like family
    val code = (0L until 6L).map(i =>
      (i, s"seed zero one two zero one seed two zero one"))
    val prose = (6L until 18L).map(i =>
      (i, s"alpha beta gamma delta alpha beta gamma delta alpha beta"))
    val docs = (code ++ prose).toDF("doc_id", "text")
    val out = SelectionOps.dsirSelect(docs,
      isTarget = array_contains(split(col("text"), " "), "seed"),
      dim = 64, k = 6).collect()
    assert(out.length == 18)
    val selected = out.filter(_.getLong(4) == 1L).map(_.getLong(0)).toSet
    assert(selected == (0L until 6L).toSet,
      s"top-6 should be the target-vocab docs, got $selected")
    val cb = out.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert((0L until 6L).map(cb).min > (6L until 18L).map(cb).max,
      "every target-like doc must out-score every background doc")
  }

  test("q141: O(k) threshold selection equals the rank-window ground truth") {
    val out = Registry.byName("q141_dsir_select").run(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cb"), col("doc_id"))
    val truth = out.select(col("doc_id"), col("cb"))
      .withColumn("sel_w", (row_number().over(w) <= 50).cast("long"))
    val joined = out.join(truth.select(col("doc_id"), col("sel_w")), Seq("doc_id"))
    assert(joined.where(col("selected") =!= col("sel_w")).count() == 0,
      "threshold flag diverges from the rank window")
    assert(out.where(col("selected") === 1).count() == 50)
  }

  test("q141: fewer docs than k selects everything; no corpus rank window") {
    import spark.implicits._
    val tiny = Seq((0L, "a b seed"), (1L, "c d"), (2L, "e f"))
      .toDF("doc_id", "text")
    val out = SelectionOps.dsirSelect(tiny,
      isTarget = array_contains(split(col("text"), " "), "seed"),
      dim = 64, k = 50)
    assert(out.collect().forall(_.getLong(4) == 1L))
    // registered plan shape: selection is the bounded-heap threshold —
    // never a rank window over the corpus (the scoring pipeline sits
    // behind a localCheckpoint, so its joins are asserted separately)
    val plan = Registry.byName("q141_dsir_select").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(800))
    assert(plan.contains("top_k_by"), plan.take(800))
    // the λ join inside the checkpointed scoring stage broadcasts the
    // 256-row weight table, never shuffling the corpus on the bucket key
    val docs256 = Tables.documents(spark, sfDir)
    val isT = array_contains(split(col("text"), " "), "dup")
    val toks = SelectionOps.dsirToks(docs256, isT, 256)
    val counts = toks.groupBy(col("b")).agg(
      count(lit(1)).as("rc"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("tc"))
    val inner = SelectionOps.dsirScored(toks, counts, 256)
      .queryExecution.executedPlan.toString
    assert(inner.contains("BroadcastHashJoin"), inner.take(800))
    assert(!inner.contains("Window"), inner.take(800))
  }

  test("q118: members cohere to their own centroid more than the global one") {
    val out = Registry.byName("q118_label_scatter").run(spark, sfDir).collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(1)).sum == 500L)
    out.foreach { r =>
      // own-centroid cohesion must dominate the global pull — the
      // separation signal the report exists to monitor (labels are
      // real clusters in the fixture)
      assert(r.getDouble(3) > r.getDouble(4),
        s"label ${r.getLong(0)}: own ${r.getDouble(3)} <= glob ${r.getDouble(4)}")
      assert(r.getDouble(2) > 0)
    }
  }

  test("exactKPerGroup equals the rank-window ground truth, partition-invariant") {
    val rows = Tables.documents(spark, sfDir)
      .select(col("lang").as("grp"), col("doc_id").as("id"))
      .withColumn("h",
        (lit(982451653L) * col("id") + lit(12345L)) % lit(1000000007L))
    // uneven targets: a third of each group, plus the degenerate 0 and
    // over-ask cases via synthetic rows
    val targets = rows.groupBy(col("grp"))
      .agg(count(lit(1)).as("n")).withColumn("target_n", expr("n DIV 3"))
      .select(col("grp"), col("target_n"))
    val truth = rows
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(col("h"))))
      .join(targets, Seq("grp"))
      .where(col("rn") <= col("target_n"))
      .select(col("grp"), col("id")).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    for (p <- Seq(1, 3, 13)) {
      val got = SelectionOps.exactKPerGroup(rows.repartition(p), targets)
        .select(col("grp"), col("id")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == truth, s"mismatch at $p partitions")
    }
    // target 0 selects nothing; target > group size selects the group
    val tiny = rows.limit(0).sparkSession.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("a", 1L, 10L), org.apache.spark.sql.Row("a", 2L, 20L),
        org.apache.spark.sql.Row("b", 3L, 30L)),
      rows.schema)
    val tinyT = tiny.sparkSession.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("a", 0L), org.apache.spark.sql.Row("b", 5L)),
      new org.apache.spark.sql.types.StructType()
        .add("grp", "string").add("target_n", "long"))
    val got = SelectionOps.exactKPerGroup(tiny, tinyT)
      .select(col("grp"), col("id")).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("b", 3L)))
  }

  test("q144: budget apportioned exactly; temperature flattens the head") {
    val out = Registry.byName("q144_temperature_mix").run(spark, sfDir).collect()
    val nTotal = out.map(_.getLong(1)).sum
    val targetSum = out.map(_.getLong(3)).sum
    // fixture is uncapped (every target_n < n_lang), so largest-remainder
    // apportionment hits the budget exactly
    assert(out.forall(r => r.getLong(3) < r.getLong(1)))
    assert(targetSum == nTotal / 2, s"budget $targetSum != ${nTotal / 2}")
    // selection fills every target
    assert(out.forall(r => r.getLong(4) == r.getLong(3)))
    // α=0.5 flattening: the head language's share shrinks, the smallest
    // language's share grows, order is preserved
    val head = out.maxBy(_.getLong(1))
    val tail = out.minBy(_.getLong(1))
    assert(head.getLong(3).toDouble / targetSum <
           head.getLong(1).toDouble / nTotal, "head share did not shrink")
    assert(tail.getLong(3).toDouble / targetSum >
           tail.getLong(1).toDouble / nTotal, "tail share did not grow")
    assert(head.getLong(3) > tail.getLong(3), "α-sampling must preserve order")
  }

  test("q145: clusters cap at half the mean cell; capping actually engages") {
    val out = Registry.byName("q145_cluster_balance").run(spark, sfDir).collect()
    val n = out.map(_.getLong(1)).sum
    val k = out.length.toLong
    val cap = math.max(1L, n / SelectionOps.adaptiveK(n) / 2)
    out.foreach { r =>
      assert(r.getLong(2) == math.min(r.getLong(1), cap))
      assert(r.getLong(3) == r.getLong(2), s"cluster ${r.getLong(0)} underfilled")
    }
    // cap = half the mean cell ⇒ by pigeonhole at least one cluster
    // exceeds it — capping must engage on any input
    assert(out.exists(r => r.getLong(1) > cap), "no cluster exceeded the cap")
    assert(k >= 1 && n > 0)
  }

  test("q147: ablation rungs are nested, deterministic, and full at 100%") {
    val out = Registry.byName("q147_ablation_rungs").run(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 10L, 100L))
    val byPct = out.map(r => r.getLong(0) -> r).toMap
    // every metric is monotone across rungs (nesting by construction)
    for (i <- 1 to 4) {
      assert(byPct(1L).getLong(i) <= byPct(10L).getLong(i), s"col $i 1->10")
      assert(byPct(10L).getLong(i) <= byPct(100L).getLong(i), s"col $i 10->100")
    }
    val n = Tables.documents(spark, sfDir).count()
    assert(byPct(100L).getLong(1) == n, "100% rung must be the corpus")
    val d10 = byPct(10L).getLong(1)
    assert(d10 > n / 50 && d10 < n * 3 / 10, s"10% rung $d10 of $n")
    // subset property recomputed from row-level membership
    val docs = Tables.documents(spark, sfDir)
      .withColumn("h",
        (lit(982451653L) * col("doc_id") + lit(12345L)) % lit(1000000007L))
    val in1 = docs.where(col("h") < 1000000007L / 100).select("doc_id")
    val in10 = docs.where(col("h") < 1000000007L / 10).select("doc_id")
    assert(in1.exceptAll(in10).count() == 0, "1% rung must nest inside 10%")
  }

  test("q149: hand-checked repetition buckets on planted repeats") {
    import spark.implicits._
    // "a b" x1 (2 toks), "c d e" x3 (3 toks each), "f" x6 (1 tok each)
    val docs = (Seq("a b") ++ Seq.fill(3)("c d e") ++ Seq.fill(6)("f"))
      .toDF("text")
    val out = SelectionOps.repetitionProfile(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // totals: 2 + 9 + 6 = 17 tokens
    assert(out("1") == ((1L, 1L, 2L, 1000L * 2 / 17)))
    assert(out("2-4") == ((1L, 3L, 9L, 1000L * 9 / 17)))
    assert(out("5+") == ((1L, 6L, 6L, 1000L * 6 / 17)))
    // fixture at this SF has no exact repeats: one honest '1' row
    val fix = Registry.byName("q149_repetition_profile").run(spark, sfDir)
      .collect()
    assert(fix.map(_.getString(0)).toSet == Set("1"))
    assert(fix(0).getLong(4) == 1000L)
  }

  test("q150: exact equal-count terciles, score-ordered, rank-window ground truth") {
    val out = Registry.byName("q150_ppl_terciles").run(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val n = out.map(_.getLong(1)).sum
    // exact rank split: |t0| = n/3, |t1| = 2n/3 - n/3, |t2| = rest
    assert(out(0).getLong(1) == n / 3)
    assert(out(1).getLong(1) == 2 * n / 3 - n / 3)
    assert(out(2).getLong(1) == n - 2 * n / 3)
    // ranking by cb means bucket score ranges are ordered (ties may
    // straddle a boundary, so <=)
    assert(out(0).getLong(5) <= out(1).getLong(4), "t0.max_cb > t1.min_cb")
    assert(out(1).getLong(5) <= out(2).getLong(4), "t1.max_cb > t2.min_cb")
    // pplTerciles equals the rank-window ground truth on a synthetic
    // frame with heavy score ties across several partition counts
    import spark.implicits._
    val scored = (1L to 200L).map(i => (i, 10L + i % 7, (i % 5) * 10L))
      .toDF("doc_id", "n_tok", "sum_bits")
      .withColumn("cb", expr("(100 * sum_bits) DIV n_tok"))
    val truth = {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cb"), col("doc_id"))
      val nn = 200L
      scored.withColumn("rk", row_number().over(w))
        .withColumn("tercile",
          when(col("rk") <= nn / 3, 0L)
            .when(col("rk") <= 2 * nn / 3, 1L).otherwise(2L))
        .groupBy(col("tercile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_toks"),
             sum(col("sum_bits")).as("sum_bits"),
             min(col("cb")).as("min_cb"), max(col("cb")).as("max_cb"))
        .orderBy(col("tercile")).collect().map(_.toSeq).toSeq
    }
    for (p <- Seq(1, 3, 13)) {
      val got = SelectionOps.pplTerciles(scored.repartition(p))
        .collect().map(_.toSeq).toSeq
      assert(got == truth, s"mismatch at $p partitions")
    }
  }

  test("q151: cumulative curve equals a direct filter at every threshold") {
    val out = Registry.byName("q151_gate_sweep").run(spark, sfDir).collect()
    assert(out.length > 1, "sweep degenerated to a single bucket")
    // monotone nondecreasing in both kept measures
    assert(out.sliding(2).forall(w =>
      w(0).getLong(1) <= w(1).getLong(1) && w(0).getLong(2) <= w(1).getLong(2)))
    // last row is the whole corpus
    val scored = SelectionOps.lmScored(Tables.documents(spark, sfDir))
      .localCheckpoint()
    val n = scored.count()
    assert(out.last.getLong(1) == n && out.last.getLong(3) == 1000L)
    // each row's kept counts equal a direct cb < threshold filter —
    // the semantic the one-scan sweep must reproduce exactly
    for (r <- out) {
      val t = r.getLong(0)
      val direct = scored.where(col("cb") < t)
        .agg(count(lit(1)), coalesce(sum(col("n_tok")), lit(0L)))
        .collect()(0)
      assert(r.getLong(1) == direct.getLong(0), s"docs mismatch at $t")
      assert(r.getLong(2) == direct.getLong(1), s"toks mismatch at $t")
    }
  }

  test("q152: purity invariants on the fixture; planted argmax tie-break") {
    val out = Registry.byName("q152_cluster_purity").run(spark, sfDir).collect()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == nVecs)
    // each label's captured-majority mass is bounded by its own mass
    assert(out.forall(r => r.getLong(3) <= r.getLong(1)))
    // every cluster elects exactly one majority label
    val k = SelectionOps.adaptiveK(nVecs)
    val nClusters = SelectionOps.q106Assign(embFrame)
      .select(col("bucket")).distinct().count()
    assert(out.map(_.getLong(2)).sum == nClusters && nClusters <= k)
    // planted tie: cluster 0 has labels {1: 2 rows, 2: 2 rows} — the
    // (count DESC, label ASC) argmax must elect label 1; cluster 1 is
    // all label 2; label 3 exists but wins nothing and must still show
    import spark.implicits._
    val asg = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("vec_id", "bucket")
    val lab = Seq((0L, 1L), (1L, 1L), (2L, 2L), (3L, 2L), (4L, 2L), (5L, 2L), (6L, 3L))
      .toDF("vec_id", "label")
    val got = SelectionOps.clusterPurity(asg, lab).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((2L, 1L, 2L, 1000L)), "tie must break to label 1")
    assert(got(2L) == ((4L, 1L, 2L, 500L)))
    assert(got(3L) == ((1L, 0L, 0L, 0L)), "label that wins nothing keeps a zero row")
  }

  test("q154: epoch arithmetic recomputes from the row; both branches engage") {
    val out = Registry.byName("q154_epoch_budget").run(spark, sfDir).collect()
    val tot = out.map(_.getLong(1)).sum
    val nl = out.length.toLong
    for (r <- out) {
      val (n, target, epochs, served, shortfall) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(target == 4L * tot / nl)
      assert(epochs == math.min((target + n - 1) / n, 4L))
      assert(served == math.min(target, 4L * n))
      assert(shortfall == target - served)
    }
    // the fixture engages both regimes: the head language serves its
    // full target below the epoch cap; tail languages hit the cap and
    // leave a shortfall
    assert(out.exists(_.getLong(5) == 0L), "no fully-served language")
    assert(out.exists(_.getLong(5) > 0L), "no capped language")
    assert(out.forall(r => r.getLong(3) >= 1L && r.getLong(3) <= 4L))
  }

  test("q156: audit cells reconcile with q150's terciles and q70's pair set") {
    val cells = Registry.byName("q156_filter_dedup_audit").run(spark, sfDir)
      .collect()
    // marginalizing duplication must reproduce q150's tercile masses —
    // the cross-query consistency the audit exists to support
    val q150 = Registry.byName("q150_ppl_terciles").run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val byT = cells.groupBy(_.getLong(0))
    for ((t, rs) <- byT) {
      assert(rs.map(_.getLong(2)).sum == q150(t)._1, s"doc marginal at $t")
      assert(rs.map(_.getLong(3)).sum == q150(t)._2, s"token marginal at $t")
    }
    // the dup marginal is exactly the q70 pair-involved doc set
    val involved = Registry.byName("q70_docs_minhash_portable")
      .run(spark, sfDir).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(cells.filter(_.getLong(1) == 1L).map(_.getLong(2)).sum ==
      involved.size.toLong)
    // the fixture engages both duplication columns
    assert(cells.exists(_.getLong(1) == 0L) && cells.exists(_.getLong(1) == 1L))
  }

  test("q152/q157 plan shapes: no corpus window; top-k is TakeOrdered") {
    // q152's majority argmax is the associative min-struct — the plan
    // must carry no Window at all
    val p152 = Registry.byName("q152_cluster_purity").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p152.contains("Window"), p152.take(800))
    // q157's top-20 is a TakeOrdered under a total order with broadcast
    // vocab joins — no Window, no global sort of the bigram frame
    val p157 = Registry.byName("q157_collocations").run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p157.contains("TakeOrderedAndProject"), p157.take(800))
    assert(!p157.contains("Window"), p157.take(800))
    assert(p157.contains("BroadcastHashJoin"), p157.take(800))
  }

  test("q160: agreement marginals equal each gate's own verdict counts") {
    val cells = Registry.byName("q160_gate_agreement").run(spark, sfDir)
      .collect()
    // every scored doc lands in exactly one cell
    val q105 = Registry.byName("q105_unigram_ppl_gate").run(spark, sfDir)
      .collect()
    assert(cells.map(_.getLong(2)).sum == q105.length.toLong)
    // the model-gate marginal is q105's own pass count
    assert(cells.filter(_.getLong(1) == 1L).map(_.getLong(2)).sum ==
      q105.count(_.getLong(3) == 1L).toLong)
    // the rule-gate marginal is withRowQuality's pass count over the
    // same (scored) doc set
    val scoredIds = q105.map(_.getLong(0)).toSet
    val rulePass = graft.queries.TrainingOps
      .withRowQuality(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("quality_pass")).collect()
      .filter(r => scoredIds.contains(r.getLong(0)))
      .count(_.getLong(1) == 1L).toLong
    assert(cells.filter(_.getLong(0) == 1L).map(_.getLong(2)).sum == rulePass)
    // the fixture engages both verdicts of both gates
    assert(cells.map(_.getLong(0)).distinct.sorted.toSeq == Seq(0L, 1L))
    assert(cells.map(_.getLong(1)).distinct.sorted.toSeq == Seq(0L, 1L))
  }

  test("q161: per-source drift equals a driver-side exact recompute") {
    val out = Registry.byName("q161_source_drift").run(spark, sfDir).collect()
    val scored = SelectionOps.lmScored(Tables.documents(spark, sfDir))
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .select(col("source"), col("n_tok"), col("sum_bits")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val tb = scored.map(_._3).sum; val tt = scored.map(_._2).sum
    val want = scored.groupBy(_._1).toSeq.map { case (src, rs) =>
      val nt = rs.map(_._2).sum; val sb = rs.map(_._3).sum
      (src, rs.size.toLong, nt, 100L * sb / nt,
        100L * sb / nt - 100L * tb / tt)
    }.sortBy(_._1)
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == want)
    // the drift column separates sources on the fixture
    assert(out.map(_.getLong(4)).distinct.length > 1)
  }

  test("q162: shards balance to +/-1 per language and reconcile with q144") {
    val out = Registry.byName("q162_mixture_shards").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // round-robin by rank: per language, shard counts differ by <= 1
    for ((lang, rows) <- out.groupBy(_._2)) {
      val ns = rows.map(_._3)
      assert(ns.max - ns.min <= 1, s"$lang shard imbalance: ${ns.toSeq}")
    }
    // the shard marginals are exactly q144's selected sets
    val q144 = Registry.byName("q144_temperature_mix").run(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5))).toMap
    for ((lang, rows) <- out.groupBy(_._2)) {
      assert(rows.map(_._3).sum == q144(lang)._1, s"$lang count marginal")
      assert(rows.map(_._4).sum == q144(lang)._2, s"$lang id-sum marginal")
    }
    // exactKRanked == the per-group rank window ground truth,
    // partition-invariant (the order analogue of exactKPerGroup's spec)
    import spark.implicits._
    val rows = (1L to 500L).map { i =>
      (s"g${i % 3}", i, (982451653L * i + 12345L) % 1000000007L)
    }.toDF("grp", "id", "h")
    val targets = Seq(("g0", 50L), ("g1", 0L), ("g2", 400L))
      .toDF("grp", "target_n")
    val truth = rows.join(targets, Seq("grp"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(col("h"))))
      .where(col("rnk") <= col("target_n"))
      .select(col("grp"), col("id"), col("h"), col("rnk").cast("long"))
      .collect().map(_.toSeq).toSet
    for (p <- Seq(1, 3, 13)) {
      val got = SelectionOps.exactKRanked(rows.repartition(p), targets)
        .collect().map(_.toSeq).toSet
      assert(got == truth, s"mismatch at $p partitions")
    }
  }

  test("q164: vocab-growth rungs equal a driver-side exact recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    def rung(thresh: Long): (Long, Long, Long) = {
      val toks = docs.filter { case (id, _) =>
        (982451653L * id + 12345L) % 1000000007L < thresh
      }.flatMap(_._2)
      val byType = toks.groupBy(identity).map(_._2.size)
      (toks.size.toLong, byType.size.toLong, byType.count(_ == 1).toLong)
    }
    val want = Seq(1L -> rung(1000000007L / 100), 10L -> rung(1000000007L / 10),
      100L -> rung(1000000007L)).map { case (pct, (t, v, h)) =>
      (pct, t, v, h, 1000L * v / t, 1000L * h / v)
    }
    val got = Registry.byName("q164_vocab_growth").run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // nesting: token mass and type counts grow with the rung; TTR falls
    // (Heaps sublinearity) on the fixture
    assert(got(0)._2 <= got(1)._2 && got(1)._2 <= got(2)._2)
    assert(got(0)._3 <= got(1)._3 && got(1)._3 <= got(2)._3)
    assert(got(0)._5 >= got(2)._5, "TTR did not fall with scale")
  }

  test("q157: top-20 PMI collocations equal a driver-side exact recompute") {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val nu = toks.map(_.size.toLong).sum
    val bigrams = toks.flatMap(t => t.zip(t.drop(1)))
    val nb = bigrams.size.toLong
    val bc = bigrams.groupBy(identity)
      .map { case (p, ps) => p -> ps.size.toLong }.filter(_._2 >= 5L)
    def ladder(x: Long): Long =
      (1 to 62).foldLeft(0L)((acc, p) => if (x >= (1L << p)) p.toLong else acc)
    val want = bc.toSeq.map { case ((x, y), nxy) =>
      val ratio = ((nxy * nu) / uni(x)) * nu / (uni(y) * nb)
      (x, y, nxy, uni(x), uni(y), ladder(ratio))
    }.sortBy { case (x, y, nxy, _, _, bits) => (-bits, -nxy, x, y) }.take(20)
    val got = Registry.byName("q157_collocations").run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
  }
}
