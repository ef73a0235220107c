package graft

import graft.functions.PolyHash.polyHash
import graft.functions.ShingleKernel.{minhashSig, shinglePacks}
import graft.functions.{MinHashParams, ShingleKernel, TextHash}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantifies the scale claim behind the q70 kernel rewrite: computing
  * minhash signatures with per-row kernels must move a small fraction
  * of the shuffle bytes that the expression-pipeline formulation
  * (repartition → window leads → distinct → groupBy-of-mins) moves on
  * the same corpus. Wall clock on a 32-core box hides shuffle cost; the
  * bytes written to shuffle do not — they are what a 1000-executor
  * cluster pays for over the network.
  */
class ShuffleVolumeSpec extends SparkSpec {

  /** Total shuffle bytes written while running `action`. */
  private def shuffleBytes(action: => Unit): Long = {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // drain the listener bus so the last stage's metrics are counted
      org.apache.spark.sql.graftbridge.ListenerBridge
        .waitUntilEmpty(spark.sparkContext, 30000)
    } finally spark.sparkContext.removeSparkListener(listener)
    bytes.get()
  }

  private val P = TextHash.Mod

  /** doc_id -> 32-min signature via the per-row kernels (q70's shape). */
  private def kernelSignatures(docs: DataFrame): DataFrame =
    docs.where(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), minhashSig(shinglePacks(col("text"))).as("sig"))

  /** The same signatures via the pre-round-3 expression pipeline. */
  private def windowSignatures(docs: DataFrame): DataFrame = {
    val toks = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
              posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val sh = toks
      .withColumn("l1", lead(col("tok"), 1).over(w))
      .withColumn("l2", lead(col("tok"), 2).over(w))
      .where(col("l2").isNotNull)
      .withColumn("shs", concat_ws(" ", col("tok"), col("l1"), col("l2")))
      .select(col("doc_id"),
              ((polyHash(col("shs")) * 1000003L + polyHash(col("shs"), 131)) % P)
                .as("h"))
      .distinct()
    val minCols = MinHashParams.params.map { case (i, a, b) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$i") }
    sh.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
              array((0 until MinHashParams.rows).map(i => col(s"m$i")): _*).as("sig"))
  }

  test("kernel minhash moves a fraction of the window pipeline's shuffle bytes") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val kernelB = shuffleBytes(kernelSignatures(docs).collect())
    val windowB = shuffleBytes(windowSignatures(docs).collect())
    // the kernel path shuffles nothing before a consumer: signatures are
    // computed scan-side
    assert(kernelB < windowB / 3,
      s"kernel=$kernelB bytes vs window=$windowB bytes")
    assert(windowB > 0)
  }

  test("two-pass heavy hitters beat full aggregation on high-cardinality streams") {
    import spark.implicits._
    // The documents fixture has a 31-token vocabulary, where map-side
    // combine already collapses a full groupBy — the regime Misra-Gries
    // exists for is heavy-tailed HIGH cardinality: here 200k rows with
    // 100k distinct rare ids and a few heavy ids. Deterministic stream.
    val n = 200000
    val k = 20
    // materialize to parquet so the stream-construction shuffle is not
    // measured — only the aggregation strategies differ between runs
    val dir = java.nio.file.Files.createTempDirectory("graft_hh").toString + "/ids"
    spark.range(n).select(
      when(col("id") % 2 === 0, concat(lit("heavy_"), (col("id") % 4).cast("string")))
        .otherwise(concat(lit("rare_"), col("id").cast("string"))).as("tok"))
      .repartition(8)
      .write.parquet(dir)
    val ids = spark.read.parquet(dir)

    val twoPass = shuffleBytes {
      val cands = ids.as[String]
        .mapPartitions(it => graft.ops.MisraGries.candidates(k, it))
        .toDF("tok").distinct()
      val total = ids.count()
      ids.join(broadcast(cands), Seq("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .where(col("c") * (k + 1) > total)
        .collect()
    }
    val fullAgg = shuffleBytes {
      val total = ids.count()
      ids.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .where(col("c") * (k + 1) > total)
        .collect()
    }
    // full aggregation shuffles ~100k partial rows; the two-pass plan
    // ships <= k candidates per partition plus the pruned recount
    assert(twoPass < fullAgg / 5, s"twoPass=$twoPass fullAgg=$fullAgg")
  }

  test("q87 packing shuffles the projected triple, never the document text") {
    import graft.queries.{PackIn, TrainingOps}
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // the registered shape: project to (doc_id, lang, n_tok) BEFORE the
    // lang repartition, so the wire carries ~24 bytes/row
    val projectedB = shuffleBytes {
      docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
                  size(split(col("text"), " ")).cast("long").as("n_tok"))
        .repartition(col("lang"))
        .sortWithinPartitions(col("lang"), col("doc_id"))
        .as[PackIn]
        .mapPartitions(it => TrainingOps.packGreedy(128L, it))
        .collect()
    }
    // the naive formulation: shuffle rows with the text column still
    // attached and tokenize after the exchange
    val unprunedB = shuffleBytes {
      docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
                  col("text"))
        .repartition(col("lang"))
        .sortWithinPartitions(col("lang"), col("doc_id"))
        .select(col("doc_id"), col("lang"),
                size(split(col("text"), " ")).cast("long").as("n_tok"))
        .as[PackIn]
        .mapPartitions(it => TrainingOps.packGreedy(128L, it))
        .collect()
    }
    // fixture docs average ~250 chars; the triple is ~24 bytes
    assert(projectedB > 0 && projectedB < unprunedB / 3,
      s"projected=$projectedB bytes vs with-text=$unprunedB bytes")
  }

  test("q93 source mixing broadcasts rates; a shuffle join would move the corpus") {
    val registeredB = shuffleBytes {
      graft.queries.Registry.byName("q93_source_mix").run(spark, sfDir).collect()
    }
    // the naive formulation: same dataflow but the rates join forced to
    // sort-merge, which exchanges every doc row WITH its text column
    val naiveB = shuffleBytes {
      val HashA = 982451653L; val HashB = 12345L
      val docs = Tables.documents(spark, sfDir)
        .withColumn("h", (lit(HashA) * col("doc_id") + lit(HashB)) % P)
      val counts = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_source"))
      val tgt = counts.agg(min(col("n_source")).as("target_n"))
      val rates = counts.crossJoin(tgt)
        .withColumn("thresh",
          floor(col("target_n").cast("double") / col("n_source") * P).cast("long"))
        .select(col("source"), col("thresh"))
      docs.join(rates.hint("merge"), Seq("source"))
        .where(col("h") < col("thresh"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
        .collect()
    }
    // registered: two count aggregates (bytes ~ n_sources); naive: the
    // full documents table crosses the wire for the join
    assert(registeredB > 0 && registeredB < naiveB / 3,
      s"registered=$registeredB bytes vs shuffle-join=$naiveB bytes")
  }

  test("q97 tokenization adds no shuffle beyond vocab learning") {
    import graft.ops.Subword
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val words = docs.select(explode_outer(split(col("text"), " ")).as("w"))
      .where(col("w").isNotNull && col("w") =!= "")
    val vocabB = shuffleBytes {
      Subword.learnVocab(words, topWords = 8, topGrams = 12)
    }
    val fullB = shuffleBytes {
      Subword.tokenize(spark, docs, topWords = 8, topGrams = 12).collect()
    }
    // the tokenize pass itself is a narrow scan-side map: every shuffle
    // byte of the full run is already present in vocab learning alone
    assert(vocabB > 0, s"vocab learning should aggregate (got $vocabB)")
    assert(fullB <= vocabB + 16384,
      s"tokenize added shuffle: full=$fullB vs vocab-only=$vocabB bytes")
  }

  test("both formulations produce identical signatures (hash identity differs only in packing)") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val a = kernelSignatures(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    // kernel h = (p1 * 1000003 + p2) % P where p1 = pack div 2^30 — the
    // window twin reproduces that combination directly from the strings
    val b = windowSignatures(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(a.toSeq === b.toSeq)
  }

  test("q102 encoding adds no shuffle beyond merge learning") {
    import graft.ops.BpeTrain
    val docs = Tables.documents(spark, sfDir)
    val words = docs.select(posexplode(split(col("text"), " ")).as(Seq("p", "w")))
      .where(col("w") =!= "").select(col("w"))
    val learnB = shuffleBytes {
      BpeTrain.learnMerges(spark, words, k = 2).collect()
    }
    val fullB = shuffleBytes {
      val merges = BpeTrain.learnMerges(spark, words, k = 2)
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
      BpeTrain.encode(spark, docs, merges).collect()
    }
    // encoding itself is a narrow memoized map: every shuffle byte of
    // learn+encode is already present in learning alone (the final
    // presentation orderBy is a range exchange of the tiny output)
    assert(learnB > 0, s"learning should aggregate (got $learnB)")
    assert(fullB <= learnB + 65536,
      s"encode added shuffle: full=$fullB vs learn-only=$learnB bytes")
  }

  test("q100 never shuffles the per-occurrence gram table") {
    // registered: hashed packs, min(struct) election with map-side
    // combine, dup starts derived as the complement per doc — the
    // exchanges carry task-combined (pack, first) rows only
    val registeredB = shuffleBytes {
      graft.queries.Registry.byName("q100_span_dedup").run(spark, sfDir).collect()
    }
    // the direct translation: gram STRINGS through a row_number window
    // (every occurrence row crosses the wire, keyed on the gram text)
    val naiveB = shuffleBytes {
      val w = 8
      val toked = Tables.documents(spark, sfDir).select(col("doc_id"),
        filter(split(col("text"), " "), t => t =!= "").as("toks"))
      val grams = toked.select(col("doc_id"),
          posexplode_outer(when(size(col("toks")) >= w,
            transform(sequence(lit(0), size(col("toks")) - w),
              i => array_join(slice(col("toks"), i + 1, lit(w)), " "))))
            .as(Seq("pos", "gram")))
        .where(col("gram").isNotNull)
      val firstWins = Window.partitionBy("gram").orderBy("doc_id", "pos")
      val dupStarts = grams
        .withColumn("rn", row_number().over(firstWins))
        .where(col("rn") > 1)
        .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("starts"))
      toked.join(dupStarts, Seq("doc_id"), "left")
        .withColumn("covered", when(col("starts").isNotNull,
          array_sort(array_distinct(flatten(transform(col("starts"),
            s => sequence(s, s + lit(w - 1))))))))
        .select(col("doc_id"),
          coalesce(size(col("covered")), lit(0)).cast("long").as("n_removed"))
        .collect()
    }
    // this fixture is the agg formulation's WORST case — nearly every
    // pack is unique, so map-side combine collapses nothing and the
    // mins exchange is as large as the occurrence table; the measured
    // win here is from 8 B packs vs gram strings alone. On production
    // corpora both effects compound: Zipf gram frequencies are exactly
    // what partial aggregation collapses, and higher-entropy text
    // compresses far worse than this ~40-word vocabulary.
    assert(registeredB > 0 && registeredB < (naiveB * 3) / 4,
      s"registered=$registeredB bytes vs gram-string-window=$naiveB bytes")
  }

  /** Total shuffle records written while running `action`. */
  private def shuffleRecords(action: => Unit): Long = {
    val records = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        records.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      org.apache.spark.sql.graftbridge.ListenerBridge
        .waitUntilEmpty(spark.sparkContext, 30000)
    } finally spark.sparkContext.removeSparkListener(listener)
    records.get()
  }

  test("algebraic hot keys: map-side combine already bounds the exchange; salting only adds rows") {
    // The measured half of Skew.saltedCountSum's scaladoc caveat. A
    // 90%-hot key through a plain groupBy(count,sum): partial
    // aggregation collapses every map task's hot rows to ONE partial
    // row, so the exchange carries <= keys x map-partitions records no
    // matter how skewed the input — reduce-side skew cannot exist for
    // an algebraic aggregate with partial agg active. The salted plan
    // pays the same bounded exchange TIMES the salt fan-out, plus a
    // second exchange for the de-salt aggregate. Salting earns its keep
    // only when the map-side hash map itself is the casualty (hot key
    // PLUS ~millions of distinct keys per task spilling the partial
    // map, or a plan where partial aggregation is absent) — not on
    // skew alone. This cert is what stops a reader from salting every
    // skewed groupBy reflexively.
    val dir = java.nio.file.Files.createTempDirectory("graft_salt").toString + "/skewed"
    Tables.lineitem(spark, sfDir)
      .withColumn("k", when(col("l_orderkey") % 10 < 9, lit("HOT"))
        .otherwise(col("l_orderkey").cast("string")))
      .select(col("k"), col("l_quantity"))
      .repartition(8)
      .write.parquet(dir)
    val skewed = spark.read.parquet(dir)
    val nKeys = skewed.select(col("k")).distinct().count()
    val nMapParts = skewed.rdd.getNumPartitions.toLong

    val unsalted = shuffleRecords {
      skewed.groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("total"))
        .collect()
    }
    val salted = shuffleRecords {
      graft.ops.Skew.saltedCountSum(skewed, "k", "l_quantity").collect()
    }
    assert(unsalted > 0 && unsalted <= nKeys * nMapParts,
      s"partial agg should bound the exchange: $unsalted records for " +
        s"$nKeys keys x $nMapParts map partitions")
    assert(unsalted <= salted,
      s"salting should never shrink an algebraic exchange: " +
        s"unsalted=$unsalted salted=$salted")
  }

  test("vec_sum moves a fraction of the posexplode dimension-stats bytes") {
    import graft.functions.VectorAgg.vecSum
    val e = Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>").as("v"))
      // spread over several partitions so both plans genuinely exchange
      .repartition(8)
      .localCheckpoint()
    // one aggregate: each task ships 2x64 doubles of partial sums
    val aggB = shuffleBytes {
      e.agg(vecSum(col("v"), 64).as("s1"),
          vecSum(transform(col("v"), x => x * x), 64).as("s2"),
          count(lit(1)).as("n"))
        .collect()
      ()
    }
    // the naive shape: 64x the corpus row count through the exchange
    val explodeB = shuffleBytes {
      e.select(posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(sum(col("x")).as("s1"), sum(col("x") * col("x")).as("s2"),
          count(lit(1)).as("n"))
        .collect()
      ()
    }
    // partial aggregation bounds both exchanges at O(tasks * dim), so
    // the shuffle delta here is packing (2 arrays + count per task vs
    // 64 keyed rows per task, each with per-row overhead) — the bigger
    // 100 TB win is the 64x per-row explode the naive shape pays
    // BEFORE its partial agg, which is CPU/memory, not shuffle; this
    // cert pins the byte half of the claim
    assert(aggB > 0 && aggB < explodeB,
      s"vec_sum=$aggB bytes vs posexplode=$explodeB bytes")
  }
}
