package graft

/** Degenerate-input contract (round-12 verdict #2): Spark 4's default
  * ANSI mode turns every data-dependent divisor into a potential
  * query-killer, so the contract is "an adversarial corpus yields a
  * (possibly empty) result, not a dead query". DegenerateSweep is the
  * exhaustive per-round main (all registered queries × all scenarios,
  * log committed as evidence); this spec keeps the per-family
  * representatives in `sbt test`:
  *
  *  - `empty`  — every table present, ZERO rows (count=0 aggregates,
  *               empty graphs, streams with nothing to stage);
  *  - `single` — one row per table (collapsed windows/pairs/splits);
  *  - `degen`  — hostile rows: empty/whitespace documents, all-identical
  *               duplicates, zero-norm and identical embeddings,
  *               zero-valued amounts, same-timestamp event bursts.
  */
class DegenerateInputSpec extends SparkSpec {

  private lazy val scenarios: Seq[(String, String)] = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_degen_spec").toString
    DegenerateSweep.buildScenarios(spark, sfDir, root)
  }

  // one representative per family: KPI agg, ratio agg, bloom prune,
  // window, exact + near-dup text dedup, span dedup, vector top-k,
  // seeded IVF, medoid, MMR, RRF, kNN, exact pairs, routed pairs,
  // graph (plain + personalized + triangles), image phash, curation
  // composition, and four incremental streams (span, corpus-prep,
  // IVF, MinHash)
  private val representatives = Set(
    "q01_orders_kpis", "q05_priority_share", "q66_bloom_prune",
    "q22_running_totals", "q15_dedup_exact", "q34_docs_jaccard_pairs",
    "q70_docs_minhash_portable", "q100_span_dedup", "q40_embed_topk",
    "q86_ivf_seeded_ann", "q72_embed_label_medoid", "q110_mmr_select",
    "q143_hybrid_rrf", "q163_knn_label_accuracy", "q43b_embed_cosine_dups",
    "q140_pairs_auto_routed", "q130_pagerank", "q132_personalized_pagerank",
    "q131_triangle_stats", "q165_image_phash_dups", "q98_corpus_prep_pipeline",
    "q101_span_dedup_stream", "q104_corpus_prep_stream", "q111_ivf_stream",
    "q129_minhash_dedup_stream")

  for ((name, _) <- Seq("empty" -> (), "single" -> (), "degen" -> ())) {
    test(s"representative queries survive the '$name' corpus") {
      val dir = scenarios.toMap.apply(name)
      val errs = DegenerateSweep.sweep(spark, dir, Some(representatives))
      assert(errs.isEmpty,
        errs.toSeq.sortBy(_._1).map { case (q, e) => s"$q :: $e" }
          .mkString("\n"))
    }
  }
}
