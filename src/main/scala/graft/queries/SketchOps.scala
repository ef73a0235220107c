package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Sketch / sampling operators for corpus-scale statistics (SURVEY.md
  * §2.11 extension surface): distinct-count sketches, heavy hitters and
  * weighted samples that stay exact-or-deterministic so the DuckDB
  * oracle can replay them, while shipping only O(k) state per task —
  * the shapes that survive a 100 TB scan.
  */
object SketchOps {

  private val P = graft.functions.TextHash.Mod

  /** Portable integer hash used by the sketches: affine transform mod
    * 1e9+7. Uniform enough on dense key spaces and replayable in any
    * SQL engine (BIGINT multiply-add-mod).
    */
  private val HashA = 982451653L
  private val HashB = 12345L

  val defs: Seq[Q] = Seq(

    // ---- KMV distinct-count sketch (fully oracle-checked) ----------------
    // q28 estimates distincts with Spark's HLL (engine-internal register
    // layout -> rows-only check). The KMV sketch is the oracle-checkable
    // sibling: the k minima of a portable hash are a deterministic
    // function of the key SET, so DuckDB replays the whole estimate with
    // ORDER BY hash LIMIT k. The custom TypedImperativeAggregate
    // (graft.functions.KMVMins) partial-aggregates map-side: each task
    // ships <= k longs, one row total crosses the final exchange.
    Q(
      "q74_kmv_distinct",
      (s, d) => {
        import graft.functions.KMVSketch.kmvMins
        val k = 256
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey").cast("long").as("key"))
          .withColumn("h", (lit(HashA) * col("key") + lit(HashB)) % P)
        val agg = li.agg(
          kmvMins(col("h"), k).as("mins"),
          countDistinct(col("key")).as("n_exact"))
        val est = when(size(col("mins")) < k,
            size(col("mins")).cast("double"))
          .otherwise(round(lit((k - 1).toDouble * P) /
            element_at(col("mins"), k), 4))
        agg
          .withColumn("n_min", size(col("mins")).cast("long"))
          .withColumn("kth_hash", element_at(col("mins"), size(col("mins"))))
          .withColumn("est_kmv", est)
          .withColumn("err_pct",
            round(abs(col("est_kmv") - col("n_exact")) / col("n_exact") * 100, 2))
          .select(col("n_exact"), col("n_min"), col("kth_hash"),
                  col("est_kmv"), col("err_pct"))
      },
      Some(s"""WITH h AS (SELECT DISTINCT ($HashA::BIGINT * l_partkey + $HashB) % $P AS h
             |           FROM lineitem),
             |mins AS (SELECT h FROM h ORDER BY h LIMIT 256),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_min, max(h) AS kth_hash FROM mins),
             |ex AS (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact FROM lineitem)
             |SELECT n_exact, n_min, kth_hash,
             |       CASE WHEN n_min < 256 THEN CAST(n_min AS DOUBLE)
             |            ELSE round(255 * ${P}.0 / kth_hash, 4) END AS est_kmv,
             |       round(abs(CASE WHEN n_min < 256 THEN CAST(n_min AS DOUBLE)
             |                      ELSE round(255 * ${P}.0 / kth_hash, 4) END
             |                 - n_exact) / n_exact * 100, 2) AS err_pct
             |FROM m, ex""".stripMargin)),

    // ---- Two-pass EXACT heavy hitters (Misra-Gries + rescore) ------------
    // Pass 1: a per-partition Misra-Gries summary (graft.ops.MisraGries)
    // ships <= k tokens per partition and is guaranteed to contain every
    // global token with count > n/(k+1). Pass 2 exact-counts ONLY the
    // candidates (broadcast semi-join prunes the shuffle to candidate
    // rows) and applies the threshold as an integer comparison — so the
    // output is exactly the true heavy-hitter set, never the approximate
    // MG counts, and the oracle is a plain GROUP BY ... HAVING. k=30 sits
    // just under the fixture's 31-token vocabulary, so the MG decrement
    // path really runs.
    Q(
      "q75_heavy_hitters",
      (s, d) => {
        import s.implicits._
        val k = 30
        val toks = Tables.documents(s, d)
          .select(explode_outer(split(col("text"), " ")).as("tok"))
          .where(col("tok").isNotNull && col("tok") =!= "")
        val candidates = toks.as[String]
          .mapPartitions(it => graft.ops.MisraGries.candidates(k, it))
          .toDF("tok").distinct()
        val counts = toks.join(broadcast(candidates), Seq("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
        val total = toks.agg(count(lit(1)).as("total"))
        counts.crossJoin(total)
          .where(col("n_tok") * (k + 1) > col("total"))
          .select(col("tok"), col("n_tok"),
                  round(col("n_tok") * 100.0 / col("total"), 3).as("pct"))
          .orderBy(desc("n_tok"), col("tok"))
      },
      Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
             |              FROM documents WHERE text IS NOT NULL),
             |t AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_tok
             |      FROM toks WHERE tok <> '' GROUP BY tok),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS total
             |        FROM toks WHERE tok <> '')
             |SELECT tok, n_tok, round(n_tok * 100.0 / total, 3) AS pct
             |FROM t, tot
             |WHERE n_tok * 31 > total
             |ORDER BY n_tok DESC, tok""".stripMargin)),

    // ---- Deterministic weighted sample (priority sampling) ---------------
    // Priority sampling (Duffield, Lund & Thorup 2007): each row gets
    // priority w / u with u uniform on (0, 1]; the k largest priorities
    // form a weighted-without-replacement sample. u comes from the
    // portable affine hash of the key, so the "random" sample is a
    // deterministic function of the data — replayable, partition-
    // invariant, and DuckDB-checkable (the hash, the division and the
    // rounding are all IEEE-exact in both engines). The top-k plan is
    // TakeOrderedAndProject: no global sort, each partition ships k rows.
    // (The affine hash is fine for keys < ~2^33 before the multiply
    // overflows; a 100 TB keyspace would swap in a 128-bit mix mod P.)
    Q(
      "q76_weighted_sample",
      (s, d) => {
        val kTop = 20
        Tables.orders(s, d)
          .select(col("o_orderkey").cast("long").as("o_orderkey"),
                  col("o_totalprice"))
          .withColumn("h", (lit(HashA) * col("o_orderkey") + lit(HashB)) % P)
          .withColumn("u", (col("h") + 1) / lit((P + 1).toDouble))
          .withColumn("prio", round(col("o_totalprice") / col("u"), 4))
          .orderBy(desc("prio"), col("o_orderkey"))
          .limit(kTop)
          .select(col("o_orderkey"), col("o_totalprice"), col("prio"))
      },
      Some(s"""SELECT o_orderkey, o_totalprice, prio FROM (
             |  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice,
             |         round(o_totalprice /
             |           ((($HashA::BIGINT * o_orderkey + $HashB) % $P + 1)
             |             / ${P + 1}.0), 4) AS prio
             |  FROM orders)
             |ORDER BY prio DESC, o_orderkey
             |LIMIT 20""".stripMargin))
  )
}
