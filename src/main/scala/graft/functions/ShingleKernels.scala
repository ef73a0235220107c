package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row text-shingling kernels (SURVEY.md §2.11 E2).
  *
  * The expression-pipeline formulation of word-3-gram shingling
  * (posexplode → window lead ×2 → concat_ws → hash → distinct) costs a
  * repartition, two window sorts and a distinct exchange before any real
  * work happens — on 100 TB those shuffles carry the entire corpus text
  * several times. Shingling is row-local, so these kernels compute each
  * document's whole shingle set (and its minhash signature) in one pass
  * over the string, inside whole-stage codegen: the only shuffles left in
  * a MinHash-LSH plan are the band-bucket join and the candidate rescore.
  *
  * Portability contract (what makes q70 oracle-checkable): a shingle's
  * identity is the pair of polynomial codepoint hashes (bases 31 and 131,
  * mod 1e9+7 — see [[TextHash.polyHash]]) of the string
  * `tok[i] + " " + tok[i+1] + " " + tok[i+2]`, packed into one long as
  * `p1 * 2^30 + p2` (both < 2^30, so the pack is bijective). DuckDB
  * replays the identical arithmetic from `string_split(text, ' ')`.
  */
object ShingleKernel {
  private final val P = TextHash.Mod
  /** pack = p1 * 2^30 + p2; unpack with div/mod 2^30 in any engine. */
  final val PackBase = 1L << 30

  /** Distinct packed dual-hash word-3-gram shingles of one document.
    * Token split mirrors Spark's `split(text, " ")` (regex, limit -1:
    * empty tokens kept). Returns insertion-ordered distinct packs; the
    * order is deterministic but callers must treat it as a set.
    */
  def shinglePacks(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    val n = toks.length
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    // Per-token prefix data: h_b = polyhash(tok, b), pow_b = b^len % P,
    // so a gram hash folds in O(1) per token instead of re-walking it.
    val h31 = new Array[Long](n); val h131 = new Array[Long](n)
    val pw31 = new Array[Long](n); val pw131 = new Array[Long](n)
    var i = 0
    while (i < n) {
      var a = 0L; var b = 0L; var p31 = 1L; var p131 = 1L
      val it = toks(i).codePoints().iterator()
      while (it.hasNext) {
        val cp = it.nextInt()
        a = (a * 31 + cp) % P
        b = (b * 131 + cp) % P
        p31 = (p31 * 31) % P
        p131 = (p131 * 131) % P
      }
      h31(i) = a; h131(i) = b; pw31(i) = p31; pw131(i) = p131
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    i = 0
    while (i <= n - 3) {
      // polyhash(t0 + " " + t1 + " " + t2): extend with separator (cp 32)
      // then with the precomputed token hash via its length power.
      var p1 = h31(i); var p2 = h131(i)
      var j = i + 1
      while (j <= i + 2) {
        p1 = ((p1 * 31 + 32) % P * pw31(j) + h31(j)) % P
        p2 = ((p2 * 131 + 32) % P * pw131(j) + h131(j)) % P
        j += 1
      }
      seen.add(p1 * PackBase + p2)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** 32-long minhash signature over a doc's packed shingle set: row i is
    * `min over shingles of (a_i * h + b_i) % P` with `h = (p1 * 1000003 +
    * p2) % P` — identical arithmetic to [[MinHashParams]]' oracle SQL.
    * Null on an empty set (callers filter docs with < 3 tokens first).
    */
  def minhashSig(packs: ArrayData): ArrayData = {
    val m = packs.numElements()
    if (m == 0) return null
    val as = MinHashParams.a; val bs = MinHashParams.b
    val sig = Array.fill(MinHashParams.rows)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val pack = packs.getLong(i)
      val h = ((pack / PackBase) * 1000003L + pack % PackBase) % P
      var r = 0
      while (r < MinHashParams.rows) {
        val v = (as(r) * h + bs(r)) % P
        if (v < sig(r)) sig(r) = v
        r += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** ORDERED packed dual-hash w-gram starts of one document (q100 span
    * dedup): element i is the pack for the gram of w consecutive
    * non-empty tokens starting at token position i — duplicates kept,
    * positions implied by index (posexplode recovers them). Same
    * identity contract as [[shinglePacks]] (dual polynomial hash of the
    * space-joined gram, packed `p1 * 2^30 + p2`) but length-w, empty
    * tokens dropped before gramming, and set-dedup skipped.
    */
  def gramPacks(s: UTF8String, w: Int): ArrayData = {
    val toks = s.toString.split(" ", -1).filter(_.nonEmpty)
    val n = toks.length
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val h31 = new Array[Long](n); val h131 = new Array[Long](n)
    val pw31 = new Array[Long](n); val pw131 = new Array[Long](n)
    var i = 0
    while (i < n) {
      var a = 0L; var b = 0L; var p31 = 1L; var p131 = 1L
      val it = toks(i).codePoints().iterator()
      while (it.hasNext) {
        val cp = it.nextInt()
        a = (a * 31 + cp) % P
        b = (b * 131 + cp) % P
        p31 = (p31 * 31) % P
        p131 = (p131 * 131) % P
      }
      h31(i) = a; h131(i) = b; pw31(i) = p31; pw131(i) = p131
      i += 1
    }
    val out = new Array[Long](n - w + 1)
    i = 0
    while (i <= n - w) {
      var p1 = h31(i); var p2 = h131(i)
      var j = i + 1
      while (j < i + w) {
        p1 = ((p1 * 31 + 32) % P * pw31(j) + h31(j)) % P
        p2 = ((p2 * 131 + 32) % P * pw131(j) + h131(j)) % P
        j += 1
      }
      out(i) = p1 * PackBase + p2
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Signed hashed-term-frequency vector of one document (q119 feature
    * hashing): every non-empty space-separated token adds
    * `(polyhash(tok,131) % 2) * 2 - 1` at index `polyhash(tok,31) % dim`.
    * One pass over the string — no token array, no per-token allocation
    * — where the pure-column fold pays O(dim) array copies per token.
    * Identity contract matches the DuckDB oracle's per-token replay.
    */
  def featureHashVec(s: UTF8String, dim: Int): ArrayData = {
    val acc = new Array[Long](dim)
    var a = 0L; var b = 0L; var len = 0
    def flush(): Unit = if (len > 0) {
      acc((a % dim).toInt) += (b % 2) * 2 - 1
      a = 0L; b = 0L; len = 0
    }
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) {
      val cp = it.nextInt()
      if (cp == 32) flush()
      else { a = (a * 31 + cp) % P; b = (b * 131 + cp) % P; len += 1 }
    }
    flush()
    new GenericArrayData(acc)
  }

  def shinglePacks(c: Column): Column =
    ColumnBridge.column(ShinglePacks(ColumnBridge.expression(c)))
  def minhashSig(c: Column): Column =
    ColumnBridge.column(MinhashSig(ColumnBridge.expression(c)))
  def gramPacks(c: Column, w: Int): Column =
    ColumnBridge.column(GramPacks(ColumnBridge.expression(c), w))
  def featureHashVec(c: Column, dim: Int): Column =
    ColumnBridge.column(FeatureHashVec(ColumnBridge.expression(c), dim))
}

/** 32 affine minhash transforms drawn once from a fixed seed; shared
  * verbatim by the Spark kernels and the generated DuckDB oracle SQL.
  */
object MinHashParams {
  final val rows = 32
  val params: IndexedSeq[(Int, Long, Long)] = {
    val rng = new java.util.Random(2024L)
    (0 until rows).map(i =>
      (i, 1L + rng.nextInt(1000000006).toLong, rng.nextInt(1000000007).toLong))
  }
  val a: Array[Long] = params.map(_._2).toArray
  val b: Array[Long] = params.map(_._3).toArray
}

case class ShinglePacks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleKernel.shinglePacks(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.shinglePacks($c)")
  override protected def withNewChildInternal(c: Expression): ShinglePacks =
    copy(child = c)
  override def prettyName: String = "shingle_packs"
}

case class GramPacks(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleKernel.gramPacks(v.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.gramPacks($c, $w)")
  override protected def withNewChildInternal(c: Expression): GramPacks =
    copy(child = c)
  override def prettyName: String = "gram_packs"
}

case class FeatureHashVec(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleKernel.featureHashVec(v.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.featureHashVec($c, $dim)")
  override protected def withNewChildInternal(c: Expression): FeatureHashVec =
    copy(child = c)
  override def prettyName: String = "feature_hash_vec"
}

case class MinhashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    ShingleKernel.minhashSig(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.ShingleKernel.minhashSig($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  override protected def withNewChildInternal(c: Expression): MinhashSig =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}
