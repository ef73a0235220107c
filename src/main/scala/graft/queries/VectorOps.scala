package graft.queries

import graft.Tables
import graft.functions.VectorFunctions.{dotProduct, squaredNorm}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (SURVEY.md §2.11 E3).
  *
  * Brute-force top-k (q40) broadcasts the (small) query set against the
  * full corpus — the right plan when queries << corpus; the dot product
  * stays inside codegen'd higher-order functions (`zip_with`+`aggregate`),
  * no UDF. The IVF variant (q42) is the scale path: corpus is bucketed by
  * nearest coarse centroid (one shuffle), queries probe only their bucket.
  * Cosines are rounded to 4 dp and ranked on the *rounded* value with a
  * vec_id tie-break, so rank order is FP-stable across engines.
  *
  * Cell count: the registered IVF/PQ queries pin nlist=8 — it is a
  * RECALL/cost tuning parameter whose oracle replay requires a fixed
  * training run, and the fixture corpora stay in the regime where 8
  * cells bound probe cost. Production at growing corpus sizes sets
  * nlist ≈ √N (the standard IVF heuristic: balances cells-scanned vs
  * vectors-per-cell at ~√N each); q106 demonstrates the
  * corpus-adaptive-k pattern with both engines deriving k from the
  * data, and the same construction applies here if an oracle-replayed
  * adaptive index is ever needed (see docs/PLANS.md, sf10 rung).
  */
object VectorOps {

  /** The embedding frame every similarity query starts from. Zero-norm
    * rows are dropped at the source (r12 verdict #2, the CosineDedup
    * semantics applied family-wide): a zero vector has no cosine to
    * anything, and under Spark 4's default ANSI mode its n2=0 divisor
    * turns every cosine expression downstream into a query-killing
    * DIVIDE_BY_ZERO. Norm-free queries (q41/q114/q117...) read
    * Tables.embeddings directly and keep all rows.
    */
  private def withNorm(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
              col("label"))
      .withColumn("n2", squaredNorm(col("v")))
      .where(col("n2") > 0d)

  private def dot(a: String, b: String): Column = dotProduct(col(a), col(b))

  /** IVF approximate top-3: corpus bucketed by nearest coarse centroid
    * (quantizer trained with two deterministic Lloyd iterations), each
    * query probes its `nprobe` nearest buckets — THE recall/cost knob of
    * every IVF index: more probes, more candidates scored, higher
    * recall. A corpus vector lives in exactly one bucket, so multi-probe
    * never double-scores a pair. q42 registers nprobe=1; OpsSpec
    * measures the recall ladder nprobe=1 vs 2 against the exact q40
    * ranking.
    */
  private[graft] def ivfTopK(s: SparkSession, d: String, nprobe: Int): DataFrame = {
    val e = withNorm(s, d)
    val cent = kmeansCentroids(e, 8, 2)
      .select(col("c_id"), col("cv"))
      .withColumn("cn2", squaredNorm(col("cv")))
    // assign every vector to its nearest centroid (broadcast centroids;
    // one pass, no shuffle until the grouped join below); rounded-cos
    // ranking with c_id tie-break = the oracle-parity contract
    val ranked = e.crossJoin(broadcast(cent))
      .withColumn("cos_c",
        round(dot("v", "cv") / sqrt(col("n2") * col("cn2")), 4))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("c_id"))))
    val assigned = ranked.where(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("n2"), col("c_id").as("bucket"))
    // queries keep their nprobe nearest buckets
    val q = ranked.where(col("vec_id") < 10 && col("rn") <= nprobe)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
              col("n2").as("qn2"), col("c_id").as("bucket"))
    assigned.join(broadcast(q), Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos_r",
        round(dot("v", "qv") / sqrt(col("n2") * col("qn2")), 4))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("vec_id"))))
      .where(col("rn") <= 3)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cos_r"))
      .orderBy(col("q_id"), col("cos_r").desc, col("n_id"))
  }

  /** Lloyd-iteration k-means over the embedding corpus: deterministic
    * seeding (first k vectors), assignment via the codegen'd cosine
    * kernel, centroid update as an element-wise mean computed with
    * posexplode + groupBy (each iteration is one broadcast join + two
    * aggregations — the distributed k-means shape that scales to any
    * corpus the assignments fit).
    *
    * Every step is an EXACT deterministic function of the data, which
    * is what lets q42/q73 carry full DuckDB oracles (the round-5 gap):
    *  - assignment ranks on round(cos, 4) with a c_id tie-break — the
    *    q86 cross-engine parity contract (an unrounded argmin is
    *    FP-last-bit sensitive);
    *  - the member mean is an exact INTEGER mean: components quantized
    *    at S=2^20 and summed as longs (a float sum's value depends on
    *    partition order — the original reason q42 had no oracle), then
    *    ONE IEEE division sum/(n*S) that both engines perform on
    *    identical operands, yielding bit-identical centroids.
    */
  private[graft] val MeanScale = 1L << 20

  /** LUT quantization unit for q73's ADC sums: power of two, so the
    * de-quantizing division is IEEE-exact in any engine.
    */
  private[graft] val PdScale = 1L << 30

  /** Pin a CONSTANT-size frame (centroid tables: k·M rows where k and
    * M are operator constants, never data-dependent) as a driver-local
    * relation: one bounded collect replaces a localCheckpoint job, and
    * every later `broadcast(...)` of it builds from the LocalTableScan
    * on the driver with NO distributed job — under AQE each of those
    * was a whole scheduling round-trip (r17 optimization, guide §1.2).
    * Values are the collected rows verbatim, so downstream arithmetic
    * is bit-identical; row order is irrelevant to every consumer (hash
    * joins, fully tie-broken windows, sorted collect_list aggregates).
    */
  private def pinLocal(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** [[kmeansCentroids]] over G independent groups in ONE plan: `em`
    * carries (`m`, `vec_id`, `v`, `n2`) and each group `m` trains its
    * own k centroids — the per-m crossJoin becomes an equi-join on m
    * and the assignment window partitions by (m, vec_id), so the
    * whole M-codebook training is one job chain instead of M
    * (r16 optimization: q73 ran 4 serial Lloyd trainings, ~28 of its
    * 38 scheduling round-trips). Identical arithmetic per group —
    * same rounded-cos assignment, same (cos DESC, c_id ASC) window
    * tie-break, same integer-scaled mean — so the per-m results are
    * bit-equal to M separate [[kmeansCentroids]] calls (OpsSpec pins
    * it; the q73 DuckDB oracle replays the composition end to end).
    */
  private[graft] def kmeansCentroidsGrouped(em: DataFrame, k: Int,
                                            iters: Int): DataFrame = {
    var cent = em.where(col("vec_id") < k)
      .select(col("m"), col("vec_id").as("c_id"), col("v").as("cv"))
    for (_ <- 0 until iters) {
      val withN2 = cent.withColumn("cn2", squaredNorm(col("cv")))
      val assigned = em.join(broadcast(withN2), "m")
        .withColumn("cos_c", round(
          dotProduct(col("v"), col("cv")) / sqrt(col("n2") * col("cn2")), 4))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("m"), col("vec_id"))
            .orderBy(col("cos_c").desc, col("c_id"))))
        .where(col("rn") === 1)
        .select(col("m"), col("c_id"), col("v"))
      cent = assigned
        .select(col("m"), col("c_id"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("m"), col("c_id"), col("i"))
        .agg(sum(round(col("x") * MeanScale).cast("long")).as("sx"),
             count(lit(1)).as("n"))
        .withColumn("m2", col("sx").cast("double") /
          (col("n") * MeanScale).cast("double"))
        .groupBy(col("m"), col("c_id"))
        .agg(expr("transform(array_sort(collect_list(struct(i, m2))), s -> s.m2)")
          .as("cv"))
      // M·k rows (operator constants): pin locally — cuts the
      // checkpoint job AND makes the next round's broadcast free
      cent = pinLocal(cent)
    }
    cent
  }

  private[graft] def kmeansCentroids(e: DataFrame, k: Int,
                                     iters: Int): DataFrame = {
    var cent = e.where(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"))
    for (_ <- 0 until iters) {
      val withN2 = cent.withColumn("cn2", squaredNorm(col("cv")))
      val assigned = e.crossJoin(broadcast(withN2))
        .withColumn("cos_c", round(
          dotProduct(col("v"), col("cv")) / sqrt(col("n2") * col("cn2")), 4))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("cos_c").desc, col("c_id"))))
        .where(col("rn") === 1)
        .select(col("c_id"), col("v"))
      // the per-round pin truncates the lineage (k tiny rows) — without
      // it the nested crossJoin plans grow exponentially and choke the
      // optimizer, the standard iterative-algorithm trap. pinLocal
      // (k rows, an operator constant) instead of localCheckpoint: no
      // checkpoint job, and the next round's broadcast builds free.
      cent = pinLocal(assigned
        .select(col("c_id"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy(col("c_id"), col("i"))
        .agg(sum(round(col("x") * MeanScale).cast("long")).as("sx"),
             count(lit(1)).as("n"))
        .withColumn("m", col("sx").cast("double") /
          (col("n") * MeanScale).cast("double"))
        .groupBy(col("c_id"))
        .agg(expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)")
          .as("cv")))
    }
    cent
  }

  /** q42's oracle: the Lloyd-trained IVF build + probe, training rounds
    * unrolled. The centroid mean replays the engine's integer mean
    * exactly: per-dimension CAST(round(v[i]*S) AS BIGINT) sums divided
    * by (n*S) in ONE double division — identical operands, identical
    * IEEE result in both engines. Assignments rank on round(cos, 4)
    * with c_id tie-breaks throughout (the q86 parity contract).
    */
  private[graft] def ivfLloydSql(k: Int, iters: Int, nprobe: Int): String = {
    val S = MeanScale
    val rounds = (1 to iters).map { r =>
      val prev = if (r == 1) "c0" else s"c${r - 1}"
      s"""a$r AS (SELECT vec_id, v, c_id FROM (
         |  SELECT e.vec_id, e.v, c.c_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC,
         |                    c.c_id) AS rn
         |  FROM e, $prev c) WHERE rn = 1),
         |m$r AS (SELECT c_id, i,
         |          CAST(sum(CAST(round(v[i] * $S) AS BIGINT)) AS DOUBLE)
         |            / CAST(count(*) * $S AS DOUBLE) AS m
         |        FROM a$r, unnest(range(1, 65)) AS r(i)
         |        GROUP BY c_id, i),
         |c$r AS (SELECT c_id, list(m ORDER BY i) AS cv FROM m$r GROUP BY c_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $k),
       |$rounds,
       |ranked AS MATERIALIZED (
       |  SELECT e.vec_id, e.v, c.c_id,
       |         row_number() OVER (PARTITION BY e.vec_id
       |           ORDER BY round(list_cosine_similarity(e.v, c.cv), 4) DESC,
       |                    c.c_id) AS rn
       |  FROM e, c$iters c),
       |asg AS MATERIALIZED (
       |  SELECT vec_id, v, c_id AS bucket FROM ranked WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv, c_id AS bucket
       |      FROM ranked WHERE vec_id < 10 AND rn <= $nprobe),
       |sc AS (SELECT q.q_id, a.vec_id AS n_id,
       |              round(list_cosine_similarity(a.v, q.qv), 4) AS cos_r,
       |              row_number() OVER (PARTITION BY q.q_id
       |                ORDER BY round(list_cosine_similarity(a.v, q.qv), 4) DESC,
       |                         a.vec_id) AS rn
       |       FROM q JOIN asg a ON a.bucket = q.bucket
       |       WHERE a.vec_id <> q.q_id)
       |SELECT q_id, n_id, cos_r FROM sc WHERE rn <= 3
       |ORDER BY q_id, cos_r DESC, n_id""".stripMargin
  }

  /** q73's oracle: codebook training (one Lloyd round per 16-dim
    * subspace — the integer-mean/rounded-cos recurrence of
    * [[kmeansCentroids]]), PQ encode on round(score, 6) with c_id
    * tie-breaks, EXACT integer ADC sums over quantized LUT entries,
    * rounded ADC ranking, exact top-25 rescore. Every comparison both
    * engines make is over a rounded or integer-exact quantity.
    */
  private[graft] def pqLloydSql: String = {
    val S = MeanScale
    val P = PdScale
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |sub AS MATERIALIZED (
       |  SELECT vec_id, m, v[(m*16+1):(m*16+16)] AS sv
       |  FROM e, unnest(range(0, 4)) AS mm(m)),
       |cb0 AS (SELECT m, vec_id AS c_id, sv AS cv FROM sub WHERE vec_id < 16),
       |a1 AS (SELECT m, vec_id, sv, c_id FROM (
       |  SELECT s.m, s.vec_id, s.sv, c.c_id,
       |         row_number() OVER (PARTITION BY s.m, s.vec_id
       |           ORDER BY round(list_cosine_similarity(s.sv, c.cv), 4) DESC,
       |                    c.c_id) AS rn
       |  FROM sub s JOIN cb0 c ON s.m = c.m) WHERE rn = 1),
       |m1 AS (SELECT m, c_id, i,
       |         CAST(sum(CAST(round(sv[i] * $S) AS BIGINT)) AS DOUBLE)
       |           / CAST(count(*) * $S AS DOUBLE) AS mu
       |       FROM a1, unnest(range(1, 17)) AS r(i)
       |       GROUP BY m, c_id, i),
       |cb AS MATERIALIZED (
       |  SELECT m, c_id, list(mu ORDER BY i) AS cv,
       |         list_inner_product(list(mu ORDER BY i),
       |                            list(mu ORDER BY i)) AS cn2
       |  FROM m1 GROUP BY m, c_id),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, m, c_id AS code FROM (
       |    SELECT s.vec_id, s.m, c.c_id,
       |      row_number() OVER (PARTITION BY s.vec_id, s.m
       |        ORDER BY round(c.cn2 - 2 * list_inner_product(s.sv, c.cv), 6),
       |                 c.c_id) AS rn
       |    FROM sub s JOIN cb c ON s.m = c.m) WHERE rn = 1),
       |n2t AS MATERIALIZED (
       |  SELECT vec_id, list_inner_product(v, v) AS n2 FROM e),
       |lut AS MATERIALIZED (
       |  SELECT s.vec_id AS q_id, s.m, c.c_id AS code,
       |         CAST(round(list_inner_product(s.sv, c.cv) * $P) AS BIGINT)
       |           AS pdu
       |  FROM sub s JOIN cb c ON s.m = c.m WHERE s.vec_id < 10),
       |approx AS (
       |  SELECT l.q_id, co.vec_id, sum(l.pdu) AS adotu
       |  FROM codes co JOIN lut l ON co.m = l.m AND co.code = l.code
       |  WHERE co.vec_id <> l.q_id
       |  GROUP BY l.q_id, co.vec_id),
       |ascored AS (
       |  SELECT a.q_id, a.vec_id,
       |         round((CAST(a.adotu AS DOUBLE) / $P)
       |               / sqrt(n.n2 * qn.n2), 6) AS ascore
       |  FROM approx a
       |  JOIN n2t n ON a.vec_id = n.vec_id
       |  JOIN n2t qn ON a.q_id = qn.vec_id),
       |cand AS (SELECT q_id, vec_id FROM (
       |  SELECT q_id, vec_id,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY ascore DESC, vec_id) AS rn
       |  FROM ascored) WHERE rn <= 25),
       |sc AS (SELECT c.q_id, c.vec_id AS n_id,
       |              round(list_cosine_similarity(ev.v, eq.v), 4) AS cos_r,
       |              row_number() OVER (PARTITION BY c.q_id
       |                ORDER BY round(list_cosine_similarity(ev.v, eq.v), 4)
       |                  DESC, c.vec_id) AS rn
       |       FROM cand c
       |       JOIN e ev ON c.vec_id = ev.vec_id
       |       JOIN e eq ON c.q_id = eq.vec_id)
       |SELECT q_id, n_id, cos_r FROM sc WHERE rn <= 3
       |ORDER BY q_id, cos_r DESC, n_id""".stripMargin
  }

  val defs: Seq[Q] = Seq(
    // ---- E3: brute-force cosine top-5 per query ---------------------------
    Q(
      "q40_embed_topk",
      (s, d) => {
        val e = withNorm(s, d)
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"))
        val scored = e.crossJoin(broadcast(q))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos_r",
            round(dot("v", "qv") / sqrt(col("n2") * col("qn2")), 4))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_r").desc, col("vec_id"))
        scored.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 5)
          .select(col("q_id"), col("vec_id").as("n_id"), col("cos_r"))
          .orderBy(col("q_id"), col("cos_r").desc, col("n_id"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
             |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10),
             |pairs AS (SELECT q_id, vec_id AS n_id,
             |                 round(list_cosine_similarity(qv, v), 4) AS cos_r
             |          FROM q, e WHERE vec_id <> q_id),
             |rk AS (SELECT q_id, n_id, cos_r,
             |              row_number() OVER (PARTITION BY q_id
             |                                 ORDER BY cos_r DESC, n_id) AS rn
             |       FROM pairs)
             |SELECT q_id, n_id, cos_r FROM rk WHERE rn <= 5
             |ORDER BY q_id, cos_r DESC, n_id""".stripMargin)),

    // ---- E3/E5: per-label vector stats ------------------------------------
    Q(
      "q41_embed_label_stats",
      (s, d) =>
        withNorm(s, d)
          .withColumn("norm", sqrt(col("n2")))
          .groupBy(col("label").cast("long").as("label"))
          .agg(count(lit(1)).as("n"),
               round(avg(col("norm")), 4).as("avg_norm"),
               round(min(col("norm")), 4).as("min_norm"),
               round(max(col("norm")), 4).as("max_norm"))
          .orderBy(col("label")),
      Some("""SELECT CAST(label AS BIGINT) AS label, count(*) AS n,
             |       round(avg(sqrt(list_dot_product(v, v))), 4) AS avg_norm,
             |       round(min(sqrt(list_dot_product(v, v))), 4) AS min_norm,
             |       round(max(sqrt(list_dot_product(v, v))), 4) AS max_norm
             |FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings)
             |GROUP BY label
             |ORDER BY label""".stripMargin)),

    // ---- E2/E3: embedding-cosine near-duplicate pairs ---------------------
    // Exact pairs at cosine >= 0.45 (the fixture corpus has no planted
    // embedding dups; 0.45 surfaces its most-similar tail) via
    // CosineDedup.pairsAbove: spherical-cap bucket pruning (complete — no
    // false negatives) + a blocked primitive-loop rescore kernel, instead
    // of materializing the O(n²) self-join through the row pipeline.
    Q(
      "q43b_embed_cosine_dups",
      (s, d) => {
        val e = withNorm(s, d).select(col("vec_id"), col("v"), col("n2"))
        graft.ops.CosineDedup.pairsAbove(e, threshold = 0.45, dim = 64)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
             |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             |       round(list_cosine_similarity(a.v, b.v), 4) AS cos_r
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45
             |ORDER BY vec_a, vec_b""".stripMargin)),

    // ---- E2/E3: END-TO-END embedding dedup ---------------------------------
    // The full near-dup removal a training-data pipeline runs: exact
    // cap-pruned pair generation (q43b's operator), connected components
    // over the pair graph (q60's operator), then keep-first (minimum
    // vec_id) per duplicate cluster. Per-label survivor counts are
    // checked against a DuckDB recursive-CTE replica of the whole chain.
    Q(
      "q43c_embed_dedup",
      (s, d) => {
        val e = withNorm(s, d)
        val pairs = graft.ops.CosineDedup.pairsAbove(
          e.select(col("vec_id"), col("v"), col("n2")), threshold = 0.45, dim = 64)
        val labels = graft.ops.ConnectedComponents.clusters(
          pairs.select(col("vec_a").as("src"), col("vec_b").as("dst")))
        e.join(labels, col("vec_id") === col("node"), "left")
          .groupBy(col("label").cast("long").as("label"))
          .agg(count(lit(1)).as("n"),
               sum(when(col("node").isNull ||
                        col("cluster_rep") === col("vec_id"), 1L)
                 .otherwise(0L)).as("n_kept"))
          .orderBy(col("label"))
      },
      Some("""WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
             |pairs AS (SELECT a.vec_id AS da, b.vec_id AS db
             |          FROM e a JOIN e b ON a.vec_id < b.vec_id
             |          WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45),
             |edges AS (SELECT da AS a, db AS b FROM pairs
             |          UNION ALL SELECT db, da FROM pairs),
             |reach(a, b) AS (SELECT a, a FROM (SELECT DISTINCT a FROM edges) t
             |                UNION
             |                SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
             |labeled AS (SELECT a AS node, min(b) AS cluster_rep FROM reach GROUP BY a)
             |SELECT CAST(e.label AS BIGINT) AS label, count(*) AS n,
             |       count(*) FILTER (WHERE l.node IS NULL OR l.cluster_rep = e.vec_id) AS n_kept
             |FROM e LEFT JOIN labeled l ON e.vec_id = l.node
             |GROUP BY 1
             |ORDER BY 1""".stripMargin)),

    // ---- E3: per-label centroid + medoid (cluster summarization) ----------
    // The curation primitive behind "pick one representative per
    // cluster": element-wise mean centroid per label (tiny, broadcast),
    // then the medoid = member with max cosine to its centroid (rounded,
    // vec_id tie-break). Fully oracle-checked.
    Q(
      "q72_embed_label_medoid",
      (s, d) => {
        val e = withNorm(s, d)
        val cent = e
          .select(col("label").cast("long").as("label"), posexplode(col("v")).as(Seq("i", "x")))
          .groupBy(col("label"), col("i")).agg(avg(col("x")).as("m"))
          .groupBy(col("label"))
          .agg(expr("transform(array_sort(collect_list(struct(i, m))), s -> s.m)")
            .as("cv"))
          .withColumn("cn2", squaredNorm(col("cv")))
        val scored = e.withColumn("label", col("label").cast("long"))
          .join(broadcast(cent), "label")
          .withColumn("cos_r",
            round(dot("v", "cv") / sqrt(col("n2") * col("cn2")), 4))
        val w = Window.partitionBy(col("label"))
          .orderBy(col("cos_r").desc, col("vec_id"))
        scored.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("label"), col("vec_id").as("medoid_id"),
                  col("cos_r").as("medoid_cos"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             |                  CAST(label AS BIGINT) AS label FROM embeddings),
             |cent AS (SELECT label, list(m ORDER BY i) AS cv
             |         FROM (SELECT label, i, avg(v[i]) AS m
             |               FROM e, unnest(range(1, 65)) AS r(i)
             |               GROUP BY label, i)
             |         GROUP BY label),
             |scored AS (SELECT e.label, e.vec_id,
             |                  round(list_cosine_similarity(e.v, cent.cv), 4) AS cos_r
             |           FROM e JOIN cent USING (label)),
             |rk AS (SELECT label, vec_id, cos_r,
             |              row_number() OVER (PARTITION BY label
             |                                 ORDER BY cos_r DESC, vec_id) AS rn
             |       FROM scored)
             |SELECT label, vec_id AS medoid_id, cos_r AS medoid_cos
             |FROM rk WHERE rn = 1
             |ORDER BY label""".stripMargin)),

    // ---- E3 scale path 2: PRODUCT-QUANTIZED ANN (ADC scoring) -------------
    // The memory-side scale technique IVF doesn't cover: vectors are
    // stored as M=4 one-byte codes (nearest sub-centroid per 16-dim
    // subspace, Lloyd-trained codebooks), queries score the whole corpus
    // through a per-query lookup table of subspace dot products
    // (asymmetric distance), and only the top approximate candidates are
    // exact-rescored. At 100 TB the code table is ~2 orders of magnitude
    // smaller than the raw vectors and the LUT join replaces every
    // full-width dot product. Recall vs the exact top-k is pinned in
    // OpsSpec (like IVF's).
    Q(
      "q73_embed_pq_ann",
      (s, d) => {
        val M = 4
        val subDim = 16
        val e = withNorm(s, d)
        // all M sub-codebooks trained in ONE grouped plan (r16
        // optimization — see kmeansCentroidsGrouped): bit-equal to the
        // old M serial kmeansCentroids calls at a quarter of the
        // scheduling round-trips
        val cb = kmeansCentroidsGrouped(
          e.select(col("vec_id"), explode(
              array((0 until M).map(m => struct(lit(m).as("m"),
                expr(s"slice(v, ${m * subDim + 1}, $subDim)").as("v"))): _*))
              .as("ms"))
            .select(col("ms.m").as("m"), col("vec_id"), col("ms.v").as("v"))
            .withColumn("n2", squaredNorm(col("v"))),
          16, 1)
          .select(col("m"), col("c_id"), col("cv"))
          .withColumn("cn2", squaredNorm(col("cv")))
        // cb is already a local relation (pinLocal inside the trainer):
        // the squaredNorm projection stays local, and both broadcasts
        // below (encode + LUT) build driver-side with no job
        val subs = e.select(col("vec_id"), col("n2"), explode_outer(
            array((0 until M).map(m => struct(lit(m).as("m"),
              expr(s"slice(v, ${m * subDim + 1}, $subDim)").as("sv"))): _*)).as("ms"))
          .select(col("vec_id"), col("n2"), col("ms.m").as("m"), col("ms.sv").as("sv"))
        // encode: nearest sub-centroid by Euclidean (cn2 - 2·dot; |sv|² is
        // constant within the argmin). Rounded score + c_id tie-break =
        // the oracle-parity contract (q86/q42 pattern).
        val codes = subs.join(broadcast(cb), "m")
          .withColumn("score", round(
            col("cn2") - lit(2) * dotProduct(col("sv"), col("cv")), 6))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("vec_id"), col("m"))
              .orderBy(col("score"), col("c_id"))))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("n2"), col("m"), col("c_id").as("code"))
        // per-query LUT: dot(q_m, centroid) for all (m, centroid),
        // quantized to integer units so the 4-term ADC sum below is
        // EXACT — a float sum's value depends on summation order, the
        // last FP-order hole between engine and oracle
        val lut = subs.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("m"), col("sv").as("qv"))
          .join(broadcast(cb), "m")
          .select(col("q_id"), col("m"), col("c_id").as("code"),
            round(dotProduct(col("qv"), col("cv")) * PdScale).cast("long")
              .as("pdu"))
        val qn = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("n2").as("qn2"))
        val approx = codes.join(broadcast(lut), Seq("m", "code"))
          .where(col("vec_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("vec_id"), col("n2"))
          .agg(sum(col("pdu")).as("adotu"))
          .join(broadcast(qn), "q_id")
          .withColumn("ascore", round(
            (col("adotu").cast("double") / PdScale) /
              sqrt(col("n2") * col("qn2")), 6))
        val cand = approx.withColumn("rn", row_number().over(
            Window.partitionBy(col("q_id")).orderBy(col("ascore").desc, col("vec_id"))))
          .where(col("rn") <= 25)
          .select(col("q_id"), col("vec_id"))
        // exact rescore of the approximate top-25, emit top-3
        val qfull = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("v").as("qv"), col("n2").as("qn2"))
        cand.join(e.select(col("vec_id"), col("v"), col("n2")), "vec_id")
          .join(broadcast(qfull), "q_id")
          .withColumn("cos_r", round(dot("v", "qv") / sqrt(col("n2") * col("qn2")), 4))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("q_id")).orderBy(col("cos_r").desc, col("vec_id"))))
          .where(col("rn") <= 3)
          .select(col("q_id"), col("vec_id").as("n_id"), col("cos_r"))
          .orderBy(col("q_id"), col("cos_r").desc, col("n_id"))
      },
      Some(pqLloydSql)),

    // ---- E3 scale path: IVF-bucketed approximate NN (FULL oracle) --------
    // Round 6 closes the last no_oracle rows: the Lloyd trainer is now
    // an exact deterministic recurrence (rounded-cos assignment,
    // integer-mean centroid update — see kmeansCentroids), so DuckDB
    // unrolls the two training rounds as CTEs (MATERIALIZED where a
    // CTE is referenced more than once — the q110/q130 lesson) and
    // replays index build + probe row for row.
    Q(
      "q42_embed_ivf_ann",
      (s, d) => ivfTopK(s, d, nprobe = 1),
      Some(ivfLloydSql(k = 8, iters = 2, nprobe = 1))),

    // ---- E3: int8 embedding quantization (full oracle) -------------------
    // Max-abs symmetric quantization to int8 — the standard storage /
    // ANN-memory compression (4x smaller than float32; PQ (q73) is the
    // lossier 16x step). Per vector: scale = max|x|, code_i = floor(x_i
    // / scale * 127). Every reported stat is either an exact double
    // (scale: one float widened to double — bit-identical across
    // engines), an integer sum (order-independent), or an integer MAX of
    // the 1e-9-quantized reconstruction error — no float aggregation
    // order anywhere, which is what lets DuckDB replay the whole
    // quantization bit-for-bit. Saturation count (|code| = 127) is the
    // quality canary: at least the max-magnitude element saturates by
    // construction.
    Q(
      "q83_embed_quantize",
      (s, d) => {
        val b = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
                  col("embedding").cast("array<double>").as("v"))
          .withColumn("m", array_max(expr("transform(v, x -> abs(x))")))
          .withColumn("scale", when(col("m") === 0, lit(1.0)).otherwise(col("m")))
        b.select(col("vec_id"), col("label"), col("scale"),
                 posexplode(col("v")).as(Seq("i", "x")))
          .withColumn("code", floor(col("x") / col("scale") * 127).cast("long"))
          .groupBy(col("vec_id"), col("label"), col("scale"))
          .agg(sum(col("code")).as("sum_codes"),
               count(when(abs(col("code")) === 127, lit(1))).as("n_sat"),
               max(floor(abs(col("x") - col("code") * col("scale") / 127)
                 * 1000000000L).cast("long")).as("max_err_1e9"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH b AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
             |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |           FROM embeddings),
             |m AS (SELECT vec_id, label, v,
             |        CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
             |             ELSE list_max(list_transform(v, x -> abs(x))) END AS scale
             |      FROM b),
             |e AS (SELECT vec_id, label, scale, unnest(v) AS x FROM m),
             |c AS (SELECT vec_id, label, scale, x,
             |        CAST(floor(x / scale * 127) AS BIGINT) AS code FROM e)
             |SELECT vec_id, label, scale,
             |       CAST(sum(code) AS BIGINT) AS sum_codes,
             |       CAST(count(*) FILTER (abs(code) = 127) AS BIGINT) AS n_sat,
             |       max(CAST(floor(abs(x - code * scale / 127) * 1000000000) AS BIGINT)) AS max_err_1e9
             |FROM c
             |GROUP BY vec_id, label, scale
             |ORDER BY vec_id""".stripMargin)),

    // ---- E3: binary (1-bit) quantization + packed Hamming top-k ----------
    // The last rung of the compression ladder (float32 -> int8 (q83) ->
    // PQ (q73) -> 1 bit/dim): keep only each component's sign, pack the
    // 64 sign bits into two 32-bit halves (two BIGINTs — no 64th-bit
    // sign-overflow games in either engine), and rank by Hamming
    // distance = popcount(xor). At 1 bit/dim the corpus codes are 32x
    // smaller than float32, the scan is pure integer xor+popcount
    // (whole-stage codegen, no float math), and sign-Hamming is a
    // monotone proxy for angular distance (SimHash with axis-aligned
    // hyperplanes). Plan shape: broadcast the bounded query set, scan
    // the corpus once, and keep top-5 per query with the bounded-heap
    // aggregate (q65's TypedImperativeAggregate) — each map task ships
    // at most 5 rows per query, NOT the |Q|x|corpus| score matrix a
    // window-rank plan would shuffle and sort. At corpus scale the same
    // codes slot behind the IVF candidate generator (q42/q86) or the
    // q71-style band join as the rerank tier; the brute scan here is
    // the bounded-|Q| search API. Oracle replays the semantic
    // definition (count of dims whose signs disagree) — same answer as
    // the packed popcount, independently derived.
    Q(
      "q135_hamming_topk",
      (s, d) => {
        import graft.functions.TopKBy.topKBy
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding").as("v"))
        // pack sign bits i..i+31 of v into one long (bit j set iff
        // component i+j is non-negative)
        def half(off: Int): Column = expr(
          s"aggregate(sequence(0, 31), 0L, (acc, i) -> " +
            s"acc + IF(element_at(v, i + $off + 1) >= 0, shiftleft(1L, i), 0L))")
        val codes = e.select(col("vec_id"), half(0).as("lo"), half(32).as("hi"))
        val qset = codes.where(col("vec_id") % 29 === 0)
          .select(col("vec_id").as("qid"), col("lo").as("qlo"), col("hi").as("qhi"))
        codes.crossJoin(broadcast(qset))
          .where(col("vec_id") =!= col("qid"))
          .withColumn("hamming",
            (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
             bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("long"))
          // combined key (hamming, vec_id) totally orders candidates;
          // negated so the keep-largest heap keeps the SMALLEST distances.
          // hamming <= 64 needs 7 bits, so a 2^56 shift leaves 56 bits
          // for vec_id — corpus ids up to 7.2e16 decode exactly (the
          // old 2^32 shift silently corrupted ids >= 4.3e9)
          .withColumn("key",
            col("hamming") * lit(72057594037927936L) + col("vec_id"))
          .groupBy(col("qid"))
          .agg(topKBy(col("key"), -col("key"), 5).as("keys"))
          .select(col("qid"), posexplode(col("keys")).as(Seq("pos", "key")))
          .select(col("qid"), (col("pos") + 1).cast("long").as("rnk"),
                  pmod(col("key"), lit(72057594037927936L)).as("vec_id"),
                  expr("key div 72057594037927936").as("hamming"))
          .orderBy(col("qid"), col("rnk"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
             |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 29 = 0),
             |h AS (SELECT qid, e.vec_id AS vec_id,
             |        CAST(length(list_filter(range(64),
             |               i -> (qv[i + 1] >= 0) <> (e.v[i + 1] >= 0))) AS BIGINT) AS hamming
             |      FROM q JOIN e ON e.vec_id <> qid),
             |r AS (SELECT qid, vec_id, hamming,
             |        row_number() OVER (PARTITION BY qid ORDER BY hamming, vec_id) AS rn
             |      FROM h)
             |SELECT qid, CAST(rn AS BIGINT) AS rnk, vec_id, hamming
             |FROM r WHERE rn <= 5
             |ORDER BY qid, rnk""".stripMargin)),

    // ---- kNN label-accuracy probe (q163) ----------------------------------
    // The retrieval-side embedding evaluation next to q152's
    // cluster-side purity: leave-one-out 5-NN majority-label
    // classification over a FIXED probe set (vec_id < 64 — bounded at
    // every SF, the q110/q135 bounded-query convention), reported per
    // true label. If neighbors don't share labels, neither ANN recall
    // nor cluster capping can save downstream quality — this is the
    // standard kNN probe (as in SimCLR/DINO linear/knn evals).
    // Deterministic: cosine scaled to an integer c4 (two identical
    // roundings both engines), candidate order (c4 DESC, vec_id ASC)
    // packed into one 64-bit ord for the bounded-heap agg (<= 5 rows
    // per probe per map task cross the wire, never a probe×corpus
    // score matrix); majority = the associative (count DESC, label
    // ASC) min-struct. One corpus scan against a broadcast 64-row
    // probe frame; no Window anywhere.
    Q(
      "q163_knn_label_accuracy",
      (s, d) => {
        import graft.functions.TopKBy.topKBy
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
            col("label").cast("long").as("label"))
          .withColumn("n2", squaredNorm(col("v")))
          .where(col("n2") > 0d) // withNorm semantics: no cosine, no row
        val q = e.where(col("vec_id") < 64)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("n2").as("qn2"), col("label").as("qlabel"))
        // ord: c4 in the high bits, -vec_id below => keep-largest heap
        // keeps (c4 DESC, vec_id ASC); payload packs (label, vec_id)
        // with a 2^48 shift (labels < 2^15, vec_id < 2^48 — documented).
        // ord uses the SAME 2^48 shift so the tiebreak holds over the
        // full vec_id domain: |c4| <= 10000 so |ord| <= 1e4*2^48 + 2^48
        // ~= 2.8e18 < 2^63 (a 2^33 shift would let vec_id >= 2^33 cross
        // adjacent c4 steps and mis-rank neighbors).
        val top = e.crossJoin(broadcast(q))
          .where(col("vec_id") =!= col("qid"))
          .withColumn("c4",
            round(round(dotProduct(col("v"), col("qv")) /
              sqrt(col("n2") * col("qn2")), 4) * 10000, 0).cast("long"))
          .withColumn("ord",
            col("c4") * lit(281474976710656L) - col("vec_id"))
          .withColumn("payload",
            col("label") * lit(281474976710656L) + col("vec_id"))
          .groupBy(col("qid"), col("qlabel"))
          .agg(topKBy(col("payload"), col("ord"), 5).as("ps"))
        val pred = top
          .select(col("qid"), col("qlabel"), explode(col("ps")).as("p"))
          .withColumn("nl", expr("p div 281474976710656"))
          .groupBy(col("qid"), col("qlabel"), col("nl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("qid"), col("qlabel"))
          .agg(min(struct((-col("c")).as("nc"), col("nl").as("l"))).as("m"))
          .select(col("qid"), col("qlabel"), col("m.l").as("pred"))
        pred.groupBy(col("qlabel"))
          .agg(count(lit(1)).as("n_queries"),
            sum((col("pred") === col("qlabel")).cast("long")).as("n_correct"))
          .withColumn("permille_correct",
            expr("(1000 * n_correct) DIV n_queries"))
          .select(col("qlabel").as("label"), col("n_queries"),
            col("n_correct"), col("permille_correct"))
          .orderBy(col("label"))
      },
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
             |         CAST(label AS BIGINT) AS label FROM embeddings),
             |q AS (SELECT vec_id AS qid, v AS qv, label AS qlabel
             |      FROM e WHERE vec_id < 64),
             |s AS (SELECT qid, qlabel, e.vec_id, e.label,
             |        CAST(round(round(list_cosine_similarity(e.v, qv), 4)
             |             * 10000) AS BIGINT) AS c4
             |      FROM q JOIN e ON e.vec_id <> qid),
             |r AS (SELECT *, row_number() OVER (PARTITION BY qid
             |        ORDER BY c4 DESC, vec_id) AS rn FROM s),
             |vote AS (SELECT qid, qlabel, label, count(*) AS c
             |         FROM r WHERE rn <= 5 GROUP BY 1, 2, 3),
             |maj AS (SELECT qid, qlabel, label AS pred FROM (
             |          SELECT *, row_number() OVER (PARTITION BY qid
             |            ORDER BY c DESC, label) AS vr FROM vote)
             |        WHERE vr = 1)
             |SELECT qlabel AS label, CAST(count(*) AS BIGINT) AS n_queries,
             |       CAST(sum(CASE WHEN pred = qlabel THEN 1 ELSE 0 END)
             |            AS BIGINT) AS n_correct,
             |       (1000 * CAST(sum(CASE WHEN pred = qlabel THEN 1 ELSE 0 END)
             |            AS BIGINT)) // CAST(count(*) AS BIGINT)
             |         AS permille_correct
             |FROM maj GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
