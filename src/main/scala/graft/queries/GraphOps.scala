package graft.queries

import graft.Tables
import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Iterative graph analytics (SURVEY §2 extension surface). The graph is
  * derived from the fact tables — here the customer↔supplier trade graph
  * of `orders ⋈ lineitem` (reference analogue: the entity-relationship
  * queries of `/root/reference/src/analysis_queries.py`, which rank
  * entities by joined activity; PageRank is the closed-loop version of
  * that ranking where an entity's weight also flows from the weight of
  * its neighbors).
  *
  * The edge derivation is the 100 TB-shaped part: one scan of lineitem
  * joined to orders on the orderkey (co-partitioned fact-fact join),
  * distinct'ed to unweighted pairs. Node cardinality is
  * |customers|+|suppliers| — it scales with SF, but stays orders of
  * magnitude below edge cardinality, which is what makes the per-round
  * rank side broadcastable/cheap (see [[graft.ops.PageRank]]).
  *
  * The whole computation is exact fixed-point integer math, so the
  * DuckDB oracle replays the k-round fixpoint hash-exactly with an
  * unrolled chain of MATERIALIZED CTEs (MATERIALIZED: each round is
  * referenced by the next AND by the contribution subquery — DuckDB
  * would otherwise inline the chain exponentially, the q110 lesson).
  */
object GraphOps {

  /** Rounds in the registered query and its oracle. */
  private val Rounds = 8

  private def pagerankOracleSql(k: Int): String = {
    val teleportNum = 15L * PageRank.Mass
    val iters = (1 to k).map { i =>
      s"""r$i AS MATERIALIZED (
         |  SELECT n.node, ($teleportNum // (100 * nn.n)) + COALESCE(c.sc, 0) AS rank
         |  FROM nodes n CROSS JOIN nn
         |  LEFT JOIN (SELECT e.dst AS node,
         |                    CAST(sum((85 * r.rank) // (100 * e.deg)) AS BIGINT) AS sc
         |             FROM ed e JOIN r${i - 1} r ON e.src = r.node
         |             GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }
    s"""WITH pairs AS MATERIALIZED (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sp
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (SELECT c AS src, sp AS dst FROM pairs
       |          UNION ALL
       |          SELECT sp AS src, c AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |ed AS MATERIALIZED (
       |  SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d ON e.src = d.src),
       |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS MATERIALIZED (
       |  SELECT node, ${PageRank.Mass} // nn.n AS rank FROM nodes CROSS JOIN nn),
       |${iters.mkString(",\n")}
       |SELECT s.s_suppkey, s.s_name, r.rank AS rank_units
       |FROM r$k r JOIN supplier s ON (r.node - 1) // 2 = s.s_suppkey
       |WHERE r.node % 2 = 1
       |ORDER BY rank_units DESC, s_suppkey
       |LIMIT 20""".stripMargin
  }

  val defs: Seq[Q] = Seq(
    // ---- PageRank over the customer↔supplier trade graph -----------------
    // Nodes: custkey*2 / suppkey*2+1 (disjoint BIGINT spaces, no string
    // keys on the shuffle). Edges: both directions of every distinct
    // (customer, supplier) pair that traded. Output: top-20 suppliers by
    // rank with a total (rank desc, suppkey) tie-break order.
    Q(
      "q130_pagerank",
      (s, d) => {
        val pairs = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("c"),
            (col("l_suppkey") * 2 + 1).as("sp"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("sp").as("dst"))
          .unionByName(pairs.select(col("sp").as("src"), col("c").as("dst")))
        PageRank.ranks(edges, Rounds)
          .where(col("node") % 2 === 1)
          .select(expr("(node - 1) div 2").as("s_suppkey"), col("rank_units"))
          .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
            Seq("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("rank_units"))
          .orderBy(col("rank_units").desc, col("s_suppkey"))
          .limit(20)
      },
      Some(pagerankOracleSql(Rounds)))
  )
}
