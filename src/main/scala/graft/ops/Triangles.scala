package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered edge orientation
  * (node-iterator++ / "compact-forward"; Suri & Vassilvitskii's
  * MapReduce formulation). Each undirected edge is oriented from its
  * lower endpoint to its higher endpoint in the total order
  * (degree, id); every triangle then has exactly one apex whose two
  * triangle edges both point outward, so joining the oriented list
  * with itself on the apex and probing the original edge set counts
  * each triangle exactly once.
  *
  * The orientation is the scale guarantee: oriented out-degree is
  * O(√m) regardless of skew — a hub's wedges are charged to the
  * neighbors that out-rank it — so wedge volume is O(m^1.5) worst
  * case instead of the Σdeg² a naive neighbor self-join pays. On a
  * power-law near-dup graph that is the difference between finishing
  * and not. Everything is equi-joins plus integer counts:
  * deterministic under any partitioning, SQL-oracle replayable.
  */
/** Driver-fold output row (top-level for by-name encoder resolution). */
final case class TriNode(node: Long, deg: Long, n_tri: Long)

object Triangles {

  /** Edge count up to which the census folds on the driver (round-16
    * optimization; the ConnectedComponents.DriverFoldCap pattern and
    * size): the distributed path pays two localCheckpoints, a wedge
    * self-join and two aggregates (~8 jobs + a 50 MB wedge shuffle at
    * sf0.1) for a pair graph of a few thousand rows. The probe is one
    * bounded limit(cap+1) job; above the cap — or on any input that
    * violates the canonical contract (non-Long ids, a ≥ b, duplicate
    * rows) — the distributed census runs unchanged. TrianglesSpec pins
    * fast == distributed.
    */
  private[graft] val DriverFoldCap = 1 << 17

  /** Per-node triangle stats over a canonical undirected edge list
    * (`a` < `b`, distinct rows, no self-loops). Returns one row per
    * node incident to ≥1 edge: (`node`, `deg` = neighbor count,
    * `n_tri` = triangles through the node, 0 when none).
    */
  def perNode(edges: DataFrame): DataFrame =
    perNodeDriver(edges).getOrElse(perNodeDistributed(edges))

  private def perNodeDriver(edges: DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.types.LongType
    val longIds = edges.schema.fields.length >= 2 &&
      edges.schema("a").dataType == LongType &&
      edges.schema("b").dataType == LongType
    if (!longIds) return None
    val spark = edges.sparkSession
    import spark.implicits._
    val probe = edges.select(col("a"), col("b"))
      .limit(DriverFoldCap + 1).as[(Long, Long)].collect()
    if (probe.length > DriverFoldCap) return None
    // canonical-contract check: the distributed operators assume it,
    // the fold verifies it (falling back keeps ANY caller exact)
    val seen = new java.util.HashSet[(Long, Long)]()
    if (probe.exists(p => p._1 >= p._2 || !seen.add(p))) return None
    val adj = new java.util.HashMap[Long, java.util.HashSet[Long]]()
    def nbrs(n: Long): java.util.HashSet[Long] = {
      var s = adj.get(n)
      if (s == null) { s = new java.util.HashSet[Long](); adj.put(n, s) }
      s
    }
    probe.foreach { case (a, b) => nbrs(a).add(b); nbrs(b).add(a); () }
    val tri = new java.util.HashMap[Long, Long]()
    probe.foreach { case (a, b) =>
      // each triangle counted once at its canonical a < b < c edge
      val (small, large) =
        if (adj.get(a).size() <= adj.get(b).size()) (adj.get(a), adj.get(b))
        else (adj.get(b), adj.get(a))
      small.forEach { c =>
        if (c > b && large.contains(c)) {
          tri.merge(a, 1L, java.lang.Long.sum _)
          tri.merge(b, 1L, java.lang.Long.sum _)
          tri.merge(c, 1L, java.lang.Long.sum _)
          ()
        }
      }
    }
    val out = new Array[TriNode](adj.size())
    var i = 0
    adj.forEach { (n, s) =>
      out(i) = TriNode(n, s.size().toLong, tri.getOrDefault(n, 0L))
      i += 1
    }
    Some(spark.createDataFrame(out.toIndexedSeq))
  }

  /** The distributed census (the pre-fold perNode body) — the scale
    * path above [[DriverFoldCap]] and the fast==distributed reference.
    */
  private[graft] def perNodeDistributed(edges: DataFrame): DataFrame = {
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    val deg = e.select(col("a").as("node"))
      .unionByName(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val or = oriented(e, deg).localCheckpoint()
    // wedges at each apex; id-order between the two out-neighbors
    // counts each wedge once AND matches the canonical probe (x < y)
    val tri = or.as("e1")
      .join(or.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("u"),
        col("e1.dst").as("x"), col("e2.dst").as("y"))
      .join(e, col("x") === col("a") && col("y") === col("b"))
      .select(col("u"), col("x"), col("y"))
    val tcnt = tri
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.join(tcnt, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** The degree-ordered orientation of a canonical edge list: each
    * edge pointed from its lower endpoint to its higher endpoint in
    * the total order (degree, id) — `a` < `b` breaks degree ties.
    * Exposed to `(deg)` callers and the spec: the O(m^1.5) wedge bound
    * is a property of THIS list (Σ C(out-degree, 2) with out-degree
    * O(√m)), so the spec certifies it here directly.
    */
  private[graft] def oriented(e: DataFrame, deg: DataFrame): DataFrame =
    e.join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("src"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("dst"))
}
