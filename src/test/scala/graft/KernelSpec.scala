package graft

import graft.functions.PolyHash.polyHash
import graft.functions.ShingleKernel.{minhashSig, shinglePacks}
import graft.functions.{MinHashParams, ShingleKernel, TextHash}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The per-row shingling kernels must be drop-in equal to the expression
  * pipeline they replaced in q70 (posexplode → window leads → concat_ws →
  * dual polyhash → distinct, then groupBy-of-32-mins): same distinct
  * shingle sets, same signatures, on the real fixture corpus.
  */
class KernelSpec extends SparkSpec {

  private val P = TextHash.Mod

  private def fixtureDocs = Tables.documents(spark, sfDir)

  test("shinglePacks equals the expression-pipeline shingle set per doc") {
    val kernel = fixtureDocs
      .select(col("doc_id"), explode_outer(shinglePacks(col("text"))).as("pack"))
      .where(col("pack").isNotNull)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pack"))).as("set"))

    val toks = fixtureDocs
      .select(col("doc_id"),
              posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val expr = toks
      .withColumn("l1", lead(col("tok"), 1).over(w))
      .withColumn("l2", lead(col("tok"), 2).over(w))
      .where(col("l2").isNotNull)
      .withColumn("shs", concat_ws(" ", col("tok"), col("l1"), col("l2")))
      .select(col("doc_id"),
              (polyHash(col("shs")) * ShingleKernel.PackBase +
                polyHash(col("shs"), 131)).as("pack"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("pack"))).as("set"))

    assert(kernel.count() > 0)
    assert(kernel.as("k").join(expr.as("e"), "doc_id")
      .where(col("k.set") =!= col("e.set")).count() === 0)
    assert(kernel.count() === expr.count())
  }

  test("minhashSig equals the groupBy-of-mins signature per doc") {
    val kernel = fixtureDocs
      .where(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), minhashSig(shinglePacks(col("text"))).as("sig"))

    val sh = fixtureDocs
      .select(col("doc_id"), explode_outer(shinglePacks(col("text"))).as("pack"))
      .where(col("pack").isNotNull)
      .withColumn("h",
        ((col("pack") / ShingleKernel.PackBase).cast("long") * 1000003L +
          col("pack") % ShingleKernel.PackBase) % P)
    val minCols = MinHashParams.params.map { case (i, a, b) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"m$i") }
    val grouped = sh.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
              array((0 until MinHashParams.rows).map(i => col(s"m$i")): _*).as("sig"))

    assert(kernel.as("k").join(grouped.as("g"), "doc_id")
      .where(col("k.sig") =!= col("g.sig")).count() === 0)
    assert(kernel.count() === grouped.count())
  }

  test("short and empty docs: empty pack set, null signature") {
    import spark.implicits._
    val df = Seq("", "one", "one two", "one two three").toDF("text")
      .select(col("text"), shinglePacks(col("text")).as("packs"))
      .select(col("text"), size(col("packs")).as("n"),
              minhashSig(col("packs")).as("sig"))
      .collect()
    val byText = df.map(r => r.getString(0) -> (r.getInt(1), r.isNullAt(2))).toMap
    assert(byText("") === ((0, true)))
    assert(byText("one") === ((0, true)))
    assert(byText("one two") === ((0, true)))
    assert(byText("one two three")._1 === 1)
    assert(!byText("one two three")._2)
  }
}
