package graft

import graft.functions.VectorFunctions.{centroidTop2, dotProduct, squaredNorm}
import org.apache.spark.sql.functions._

/** Pins the codegen'd CentroidTop2 kernel bit-for-bit to the
  * `functions.aggregate` fold it replaced (round-10 verdict #1: the
  * fold's interpreted per-element step was ~40 s of q140's sf100 leg).
  * The fold form below IS the replaced implementation, kept here as the
  * executable reference — if the kernel's rounding or tie order ever
  * drifts from Catalyst's (round-HALF_UP at 4 dp, cos DESC / id ASC),
  * this suite fails before the oracle gate does.
  */
class CentroidKernelSpec extends SparkSpec {

  /** The replaced fold: two best (rounded-cosine, id) members, Catalyst
    * `round`/comparison semantics throughout.
    */
  private def foldTop2(cents: org.apache.spark.sql.Column,
                       v: org.apache.spark.sql.Column,
                       n2: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(
      cents,
      struct(lit(-2.0).as("c1"), lit(Long.MaxValue).as("i1"),
             lit(-3.0).as("c2"), lit(Long.MaxValue).as("i2")),
      (acc, c) => {
        val cs = round(dotProduct(v, c.getField("cv")) /
          sqrt(n2 * c.getField("cn2")), 4)
        val id = c.getField("id")
        val beats1 = cs > acc.getField("c1") ||
          (cs === acc.getField("c1") && id < acc.getField("i1"))
        val beats2 = cs > acc.getField("c2") ||
          (cs === acc.getField("c2") && id < acc.getField("i2"))
        when(beats1,
          struct(cs.as("c1"), id.as("i1"),
            acc.getField("c1").as("c2"), acc.getField("i1").as("i2")))
          .when(beats2,
            struct(acc.getField("c1").as("c1"), acc.getField("i1").as("i1"),
              cs.as("c2"), id.as("i2")))
          .otherwise(acc)
      })

  private def embWithCents = {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", squaredNorm(col("v")))
    // every vector scores EVERY fixture vector as a candidate centroid:
    // the densest tie surface the fixture can produce (near-dup planted
    // pairs give exactly-equal rounded cosines, exercising the id
    // tie-break on both slots)
    val cents = e.agg(collect_list(
      struct(col("vec_id").as("id"), col("v").as("cv"), col("n2").as("cn2")))
      .as("cands"))
    e.crossJoin(broadcast(cents))
  }

  test("kernel top-2 equals the replaced aggregate-fold, all fixture vectors") {
    val both = embWithCents
      .withColumn("kf", foldTop2(col("cands"), col("v"), col("n2")))
      .withColumn("kk", centroidTop2(col("cands"), col("v"), col("n2")))
    val diff = both.where(
      col("kf.c1") =!= col("kk.c1") || col("kf.i1") =!= col("kk.i1") ||
      col("kf.c2") =!= col("kk.c2") || col("kf.i2") =!= col("kk.i2"))
    assert(diff.count() == 0, "kernel diverged from the fold reference")
    // sanity: slots are genuinely ordered and distinct on the fixture
    val r = both.select(col("kk.c1"), col("kk.c2"), col("kk.i1"), col("kk.i2"))
      .where(col("c1") < col("c2")).count()
    assert(r == 0)
  }

  test("kernel round matches Catalyst round(x, 4) on the cosine surface") {
    // the scalar rounding path, checked directly: Catalyst Round vs the
    // kernel's BigDecimal.valueOf(...).setScale(4, HALF_UP)
    val cos = embWithCents.limit(50)
      .select(explode(col("cands")).as("c"), col("v"), col("n2"))
      .select((dotProduct(col("v"), col("c.cv")) /
        sqrt(col("n2") * col("c.cn2"))).as("raw"))
    val checked = cos.select(col("raw"), round(col("raw"), 4).as("cat"))
      .collect()
    checked.foreach { r =>
      val raw = r.getDouble(0)
      assert(graft.functions.VectorOps2.round4(raw) == r.getDouble(1),
        s"round4($raw) != Catalyst round")
    }
    assert(checked.nonEmpty)
  }

  test("fewer than two candidates leaves slot 2 at the sentinel") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("n2", squaredNorm(col("v")))
    val one = e.where(col("vec_id") === 0)
      .agg(collect_list(struct(col("vec_id").as("id"), col("v").as("cv"),
        col("n2").as("cn2"))).as("cands"))
    val out = e.limit(5).crossJoin(broadcast(one))
      .select(centroidTop2(col("cands"), col("v"), col("n2")).as("t"))
      .select(col("t.i1"), col("t.i2")).collect()
    out.foreach { r =>
      assert(r.getLong(0) == 0L)
      assert(r.getLong(1) == Long.MaxValue)
    }
  }

  test("zero-norm vector: NaN cosines neither crash nor win a slot") {
    // A zero vector's cosine is 0/0 = NaN. Catalyst's RoundBase passes
    // NaN through; before the guard, VectorOps2.round4 threw
    // NumberFormatException from BigDecimal.valueOf(NaN) — one zero
    // embedding crashed every query through the kernel. PINNED
    // behavior (documented deviation from the replaced fold, whose
    // Catalyst comparisons order NaN greatest): NaN never beats either
    // slot, so a zero-norm QUERY vector keeps both sentinels, and a
    // zero-norm CANDIDATE never becomes anyone's best centroid.
    import spark.implicits._
    val dim = 4
    val rows = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array.fill(dim)(0.0)), // zero-norm
      (2L, Array(0.0, 1.0, 0.0, 0.0)))
    val e = rows.toDF("vec_id", "v").withColumn("n2", squaredNorm(col("v")))
    val cents = e.agg(collect_list(struct(col("vec_id").as("id"),
      col("v").as("cv"), col("n2").as("cn2"))).as("cands"))
    val out = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), centroidTop2(col("cands"), col("v"), col("n2")).as("t"))
      .select(col("vec_id"), col("t.c1"), col("t.i1"), col("t.i2"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toMap
    // zero-norm query: every cosine NaN, both slots stay at sentinels
    assert(out(1L) == ((-2.0, Long.MaxValue, Long.MaxValue)))
    // non-zero queries: best is self (cos 1.0); the zero candidate's
    // NaN cosine never displaced a real slot
    assert(out(0L)._1 == 1.0 && out(0L)._2 == 0L && out(0L)._3 == 2L)
    assert(out(2L)._1 == 1.0 && out(2L)._2 == 2L && out(2L)._3 == 0L)
    // and the scalar path itself: RoundBase parity on non-finites
    assert(graft.functions.VectorOps2.round4(Double.NaN).isNaN)
    assert(graft.functions.VectorOps2.round4(Double.PositiveInfinity)
      == Double.PositiveInfinity)
    assert(graft.functions.VectorOps2.round4(Double.NegativeInfinity)
      == Double.NegativeInfinity)
  }
}
