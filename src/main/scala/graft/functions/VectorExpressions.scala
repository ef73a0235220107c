package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd float-vector kernels (SURVEY.md §2.11 E3).
  *
  * `aggregate(zip_with(a, b, ...))` expresses a dot product but runs on
  * the interpreted higher-order-function path with per-element closure
  * invocation; these expressions compile to a tight primitive loop over
  * the unsafe array data — the difference is ~an order of magnitude on
  * wide embedding columns, which matters when the cross-join scores
  * millions of candidate pairs.
  */
object VectorOps2 {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  def norm2(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val v = a.getDouble(i)
      acc += v * v
      i += 1
    }
    acc
  }
}

/** dot_product(array<double>, array<double>) -> double. Null if either
  * side is null; elements are assumed non-null (fixture embeddings).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps2.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorOps2.dot($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(l, r)
  override def prettyName: String = "dot_product"
}

/** squared_norm(array<double>) -> double. */
case class SquaredNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any): Any =
    VectorOps2.norm2(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorOps2.norm2($a)")
  override protected def withNewChildInternal(c: Expression): SquaredNorm = copy(c)
  override def prettyName: String = "squared_norm"
}

object VectorFunctions {
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def squaredNorm(a: Column): Column =
    ColumnBridge.column(SquaredNorm(ColumnBridge.expression(a)))

  /** Register graft's custom expressions for the SQL entry point:
    * `SELECT title_case(s)`, `dot_product(a, b)`, `squared_norm(a)`.
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("title_case",
      exprs => TitleCase(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("squared_norm",
      exprs => SquaredNorm(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("poly_hash",
      exprs => PolyHash(exprs.head), "scala_udf")
  }
}
