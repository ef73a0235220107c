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

  test("Misra-Gries summary contains every item above n/(k+1)") {
    // Zipf-ish stream: item i appears ~ 4000/i times; k=8 => threshold
    // n/(k+1), which only the very frequent heads clear.
    val stream = (1 to 60).flatMap(i => Seq.fill(4000 / i)(s"item_$i"))
    val shuffled = new scala.util.Random(7).shuffle(stream)
    val n = shuffled.size
    val k = 8
    val exactHH = shuffled.groupBy(identity).collect {
      case (x, xs) if xs.size.toLong * (k + 1) > n => x
    }.toSet
    assert(exactHH.nonEmpty)
    val cands = graft.ops.MisraGries.candidates(k, shuffled.iterator).toSet
    assert(exactHH.subsetOf(cands), s"missing: ${exactHH -- cands}")
    assert(cands.size <= k)
  }

  test("q75 two-pass result equals the direct full aggregation") {
    val viaQuery = queries.Registry.byName("q75_heavy_hitters")
      .run(spark, sfDir).collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = Tables.documents(spark, sfDir)
      .select(explode_outer(split(col("text"), " ")).as("tok"))
      .where(col("tok").isNotNull && col("tok") =!= "")
    val n = toks.count()
    val direct = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
      .where(col("n_tok") * 31 > n)
      .orderBy(desc("n_tok"), col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaQuery.toSeq === direct.toSeq)
    assert(viaQuery.nonEmpty)
  }

  test("q76 priority sample is partition-invariant and weight-biased") {
    val q = queries.Registry.byName("q76_weighted_sample")
    val a = q.run(spark, sfDir).collect().map(_.toSeq)
    val b = q.run(spark, sfDir).collect().map(_.toSeq) // replay = identical
    assert(a.toSeq === b.toSeq)
    assert(a.length === 20)
    // weighted sampling must pull the sample's mean weight above the
    // population mean (priorities scale with weight)
    val sampleMean = a.map(_(1).asInstanceOf[Double]).sum / a.length
    val popMean = Tables.orders(spark, sfDir)
      .agg(avg(col("o_totalprice"))).head().getDouble(0)
    assert(sampleMean > popMean)
  }

  test("q77 quality flags are non-vacuous (both outcomes occur)") {
    // run at sf0.01 — the thresholds are tuned to split that corpus; the
    // gate (selfcheck/driver) also verifies values there
    val rows = queries.Registry.byName("q77_doc_quality_filters")
      .run(spark, "/root/testdata/sf0.01").collect()
    for (flag <- Seq("wc_ok", "mwl_ok", "rep_ok", "stop_ok", "quality_pass")) {
      val vals = rows.map(_.getAs[Long](flag)).toSet
      assert(vals === Set(0L, 1L), s"$flag is vacuous: $vals")
    }
  }

  test("q78 finds cross-document boilerplate spans") {
    val rows = queries.Registry.byName("q78_span_dedup")
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.map(_.getAs[Long]("n_dup_chunks")).sum > 0)
    assert(rows.forall(r => r.getAs[Long]("n_dup_chunks") <= r.getAs[Long]("n_chunks")))
    // chunk accounting: every token lands in exactly one chunk
    val nChunks = rows.map(_.getAs[Long]("n_chunks")).sum
    val expected = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(ceil(size(split(col("text"), " ")) / 5.0).cast("long").as("nc"))
      .agg(sum(col("nc"))).head().getLong(0)
    assert(nChunks === expected)
  }

  test("q81 decontamination flags the eval doc whose near-dup is in train") {
    val rows = queries.Registry.byName("q81_decontamination")
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    // background vocabulary overlap is partial, never total...
    assert(rows.forall(r => r.getAs[Double]("overlap") > 0.0))
    // ...except the planted near-duplicate, which must be caught
    assert(rows.exists(_.getAs[Long]("contaminated") == 1L))
    assert(rows.exists(_.getAs[Long]("contaminated") == 0L))
    assert(rows.forall(r => r.getAs[Long]("n_leaked") <= r.getAs[Long]("n_shingles")))
  }

  test("q83 int8 quantization: error bounded by one step, saturation present") {
    val rows = queries.Registry.byName("q83_embed_quantize")
      .run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val step = scale / 127
      // floor quantization: reconstruction error is strictly under one step
      assert(r.getAs[Long]("max_err_1e9") <= math.ceil(step * 1e9).toLong,
        s"vec ${r.getAs[Long]("vec_id")}: err exceeds one quantization step")
      // the max-magnitude element always saturates by construction
      assert(r.getAs[Long]("n_sat") >= 1)
    }
  }

  test("q126 sample quantiles: ranks near target; GK cross-check in bound") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice")).cache()
    try {
      // the oracle-checked portable form: bottom-64-by-hash sample,
      // type-1 index selection. Rank error is statistical, O(n/sqrt(k));
      // bound each returned value's true rank by 4 sample-CDF standard
      // deviations plus the 1/k index-selection granularity.
      val rows = queries.Registry.byName("q126_sample_quantiles")
        .run(spark, sfDir).collect()
      assert(rows.length == 3)
      val k = 64.0
      rows.foreach { r =>
        val flag = r.getString(0); val n = r.getLong(1)
        assert(r.getLong(2) == math.min(n, 64L))
        for ((q, i) <- Seq(0.5, 0.95, 0.99).zipWithIndex) {
          val v = r.getDouble(3 + i)
          val rank = li.where(col("l_returnflag") === flag &&
            col("l_extendedprice") <= v).count()
          val eps = 4 * n * math.sqrt(q * (1 - q) / k) + n / k + 1
          assert(math.abs(rank - q * n) <= eps,
            s"$flag p$q: rank=$rank target=${q * n} n=$n v=$v")
        }
      }
      // the q103 retirement cross-check: the engine-internal
      // approx_percentile (GK summary, no external oracle) keeps its
      // much tighter n/accuracy guarantee
      val gk = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 10000)")
            .as("qs")).collect()
      assert(gk.length == 3)
      gk.foreach { r =>
        val flag = r.getString(0); val n = r.getLong(1)
        val qs = r.getAs[scala.collection.Seq[Double]]("qs")
        for ((q, i) <- Seq(0.5, 0.95, 0.99).zipWithIndex) {
          val rank = li.where(col("l_returnflag") === flag &&
            col("l_extendedprice") <= qs(i)).count()
          val eps = n / 10000.0 + 2
          assert(math.abs(rank - q * n) <= eps,
            s"GK $flag p$q: rank=$rank target=${q * n} n=$n")
        }
      }
    } finally { li.unpersist(); () }
  }

  test("q126 sample is partition-invariant (TopKBy merge path)") {
    // a different physical partitioning must land on the same sample:
    // the bottom-k-by-hash heap is losslessly mergeable, so the result
    // cannot depend on task boundaries
    val base = queries.Registry.byName("q126_sample_quantiles")
      .run(spark, sfDir).collect().map(_.toSeq).toSeq
    import graft.functions.TopKBy.topKBy
    val P = 1000000007L; val A = 1103515245L; val B = 12345L
    val keyed = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("bigint").as("cents"),
        ((lit(A) * ((col("l_orderkey") * 8 + col("l_linenumber")) % P)
          + B) % P).as("h"))
    def sampleOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("l_returnflag"))
        .agg(topKBy(col("cents"), -col("h"), 64).as("samp"))
        .orderBy(col("l_returnflag"))
        .collect().map(r => r.getString(0) ->
          r.getAs[scala.collection.Seq[Long]]("samp").sorted.toSeq).toSeq
    assert(sampleOf(keyed.repartition(13)) == sampleOf(keyed.repartition(3)))
    assert(base.nonEmpty)
  }

  test("q108 CMS: never underestimates; both exact and overcounted occur") {
    val out = queries.Registry.byName("q108_cms_counts").run(spark, sfDir)
      .cache()
    try {
      assert(out.where(col("overcount") < 0).count() == 0,
        "CMS underestimated a count — impossible for correct counters")
      assert(out.where(col("overcount") === 0).count() > 0)
      // w=16 is sized so the fixture exercises collisions
      assert(out.where(col("overcount") > 0).count() > 0)
      // total mass conservation per row: every row of the matrix sums
      // to the token count, so overcount <= N trivially; the CMS bound
      // is overcount <= colliding mass < N - n_exact
      val n = Tables.documents(spark, sfDir)
        .select(explode(split(col("text"), " ")).as("t"))
        .where(col("t") =!= "").count()
      assert(out.where(col("est") > n).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("cms_counters aggregate equals groupBy-built matrix; partition-invariant") {
    import graft.functions.CmsSketch
    import graft.functions.PolyHash.polyHash
    val dR = 4; val w = 16
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
      .withColumn("h", polyHash(col("tok")))
    def viaAgg(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(CmsSketch.cmsCounters(col("h"), dR, w).as("cms"))
        .collect().head.getAs[scala.collection.Seq[Long]]("cms").toSeq
    val a = viaAgg(toks)
    // mergeability: a different partitioning merges to the same matrix
    assert(viaAgg(toks.repartition(7)) == a)
    // ground truth: build each row's cells with a plain groupBy sum
    val cells = toks.select(
        (0 until dR).map(j =>
          ((lit(CmsSketch.rowA(j)) * col("h") + lit(CmsSketch.RowB))
            % CmsSketch.P % w).cast("int").as(s"c$j")): _*)
      .collect()
    val truth = new Array[Long](dR * w)
    cells.foreach(r => (0 until dR).foreach(j => truth(j * w + r.getInt(j)) += 1))
    assert(a == truth.toSeq)
    // SQL surface: the extensions-registered function plans the same agg
    toks.createOrReplaceTempView("t_cms_toks")
    val sql = spark.sql(s"SELECT cms_counters(h, 4, 16) AS cms FROM t_cms_toks")
      .collect().head.getAs[scala.collection.Seq[Long]]("cms").toSeq
    assert(sql == a)
  }

  test("q109 streaming CMS equals the batch q108 result row for row") {
    // counter matrices are entrywise-additive, so accumulating one
    // partial per micro-batch reproduces the batch matrix exactly —
    // streaming adds zero approximation on top of the sketch's own
    val batch = queries.Registry.byName("q108_cms_counts").run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val streamed = queries.Registry.byName("q109_cms_stream").run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("q124 HLL: aggregate registers equal the groupBy replay, partition-invariant") {
    import graft.functions.HllSketch
    val m = 256
    val wB = HllSketch.wBits(m)
    val packs = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long").as("key"))
      .withColumn("pack", queries.SketchOps.hllPack(col("key")))
    def regsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(HllSketch.hllRegisters(col("pack"), m).as("regs"))
        .collect().head.getSeq[Long](0)
    val a = regsOf(packs)
    // replay: rank per row with plain column arithmetic, max per register
    // ascending fold so the LARGEST threshold lands outermost: the
    // final expression checks w >= 2^(wB-1) first, then descends
    val ladder = (1 to wB - 1).foldLeft(lit(0)) { (acc, k) =>
      when(col("w") >= (1L << k), lit(k)).otherwise(acc)
    }
    val replay = packs
      .withColumn("idx", pmod(col("pack"), lit(m.toLong)))
      .withColumn("w", floor(col("pack") / m))
      .withColumn("rho",
        when(col("w") === 0L, lit(wB + 1).cast("long"))
          .otherwise(lit(wB) - ladder.cast("long")))
      .groupBy(col("idx")).agg(max(col("rho")).as("mr"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = (0 until m).map(i => replay.getOrElse(i.toLong, 0L))
    assert(a == b)
    // partition invariance: the merge path lands on the same registers
    val c = regsOf(packs.repartition(13))
    assert(c == a)
  }

  test("q124 portable HLL, built-in HLL, and exact distinct agree within tolerance") {
    // the q28 retirement cross-check: the engine-internal
    // approx_count_distinct (pure-speed path, no external oracle) and
    // the oracle-checked portable HLL must both land near the truth
    val r = queries.Registry.byName("q124_hll_distinct").run(spark, sfDir)
      .collect().head
    val (exact, nZero, raw) = (r.getLong(0), r.getLong(1), r.getDouble(3))
    // the registered row carries the RAW estimate plus the components
    // (n_zero, s_scaled) so consumers apply the standard small-range
    // correction without the oracle depending on libm's ln: below
    // 2.5m with empty registers, linear counting m·ln(m/V) applies
    // (Flajolet et al. 2007) — this fixture's cardinality sits in
    // exactly that regime
    val est =
      if (raw <= 2.5 * 256 && nZero > 0) 256.0 * math.log(256.0 / nZero)
      else raw
    assert(exact > 0 && math.abs(est - exact) / exact < 0.25,
      s"corrected est=$est (raw=$raw n_zero=$nZero) exact=$exact")
    val builtin = Tables.lineitem(spark, sfDir)
      .agg(approx_count_distinct(col("l_partkey")).as("a"))
      .collect().head.getLong(0)
    assert(math.abs(builtin.toDouble - exact) / exact < 0.25,
      s"builtin est=$builtin exact=$exact")
    // registers were genuinely populated (no empty-sketch degenerate)
    assert(nZero < 256, s"n_zero=$nZero")
  }

  test("q125 streaming HLL equals the batch q124 result row for row") {
    // registers are entrywise-MAX-mergeable, so folding one partial per
    // micro-batch reproduces the batch registers exactly
    val batch = queries.Registry.byName("q124_hll_distinct").run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val streamed = queries.Registry.byName("q125_hll_stream").run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  test("hll_registers is callable from the SQL surface") {
    val m = 64
    Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long").as("key"))
      .withColumn("pack", queries.SketchOps.hllPack(col("key")))
      .createOrReplaceTempView("hll_keys")
    val viaSql = spark.sql(s"SELECT hll_registers(pack, $m) AS regs FROM hll_keys")
      .collect().head.getSeq[Long](0)
    val viaApi = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").cast("long").as("key"))
      .agg(graft.functions.HllSketch.hllRegisters(
        queries.SketchOps.hllPack(col("key")), m))
      .collect().head.getSeq[Long](0)
    assert(viaSql == viaApi && viaSql.exists(_ > 0L))
  }

  test("q120 KMV set-operation estimate lands near the exact intersection") {
    val r = queries.Registry.byName("q120_kmv_join_card").run(spark, sfDir)
      .collect().head
    val (nU, nBoth) = (r.getLong(0), r.getLong(2))
    val (estU, estI) = (r.getDouble(3), r.getDouble(4))
    val exact = r.getLong(5)
    // structure: the union minima can't disagree with their definition
    assert(nBoth >= 0 && nBoth <= nU && nU <= 256)
    assert(estI <= estU + 1e-9)
    // estimate quality: k=256 gives ~6% standard error on the union and
    // the rho fraction compounds it — 25% is a loose deterministic
    // bound the fixture sits well inside (measured ~1-6%)
    assert(exact > 0 && math.abs(estI - exact) / exact < 0.25,
      s"est=$estI exact=$exact")
  }
}
