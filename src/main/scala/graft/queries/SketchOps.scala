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
             |FROM m, ex""".stripMargin))
  )
}
