package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.DatasetBridge
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Backward as-of join as a first-class Catalyst operator (SURVEY §4.2
  * preference (c): custom LogicalPlan + SparkStrategy + SparkPlan).
  *
  * Semantics: for every left row, attach the single right row with the
  * LARGEST right-time ≤ left-time among rows with equal keys; unmatched
  * left rows keep nulls (left-outer as-of) — DuckDB's `ASOF JOIN`, kdb's
  * `aj`. The window-function encoding (q44) needs the probe rows unioned
  * into the reference stream and a full-stream window sort; this
  * operator instead co-partitions the two sides by key and streams each
  * partition with a two-pointer merge:
  *
  *  - distribution: `ClusteredDistribution(keys)` on both children —
  *    EnsureRequirements inserts (or reuses) hash exchanges, so the
  *    merge is local to each of the N shuffle partitions;
  *  - ordering: (keys, time) ascending on both children — Spark inserts
  *    the sorts; the merge itself is O(|L| + |R|) per partition with ONE
  *    buffered right row, no per-key grouping or state;
  *  - at 100 TB this is the same exchange/sort cost as a sort-merge
  *    join, but the probe side never materializes candidate sets — the
  *    cursor never moves backward.
  *
  * Null keys never match (callers filter them; the fixture keys are
  * non-null). Time columns must be timestamp or long (compared on the
  * internal long value).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val (lOut, rOut) = (left.output, right.output)
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      // bind against nullable right attrs: unmatched rows carry the null
      // row, and the projection must emit real nulls, not zero-values
      val resultProj = UnsafeProjection.create(
        out, lOut ++ rOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // single-row state: the best (largest-time) right row seen for the
      // key currently under the cursor
      var bestKey: UnsafeRow = null
      var bestRow: InternalRow = null
      lIter.map { l =>
        val lKey = lKeyProj(l).copy()
        val lTime = lTimeProj(l).getLong(0)
        var advance = rBuf.hasNext
        while (advance) {
          val head = rBuf.head
          val headKey = rKeyProj(head)
          val c = keyOrd.compare(headKey, lKey)
          if (c < 0) { // right cursor behind the probe key: skip
            rBuf.next()
            advance = rBuf.hasNext
          } else if (c == 0 && rTimeProj(head).getLong(0) <= lTime) {
            bestKey = headKey.copy()
            bestRow = rBuf.next().copy()
            advance = rBuf.hasNext
          } else advance = false // ahead of the probe: stop
        }
        val matched = bestRow != null && keyOrd.compare(bestKey, lKey) == 0
        resultProj(joined(l, if (matched) bestRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

/** Public API for the operator. */
object AsOf {

  private def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Backward as-of join: each left row gets the latest right row with
    * right time ≤ left time and equal keys; unmatched ⇒ right columns
    * null. Time columns must be timestamp or long. Right columns keep
    * their names — make them distinct from the left's before joining.
    */
  def joinBackward(left: DataFrame, right: DataFrame,
                   keys: Seq[(String, String)],
                   time: (String, String)): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    // Re-alias both sides so every attribute gets a fresh exprId — a
    // hand-built binary plan skips the analyzer's relation dedup, so
    // self-joins would otherwise carry conflicting ids.
    def fresh(df: DataFrame) = DatasetBridge.analyzed(
      df.select(df.columns.map(c => col(c).as(c)).toSeq: _*))
    val lPlan = fresh(left)
    val rPlan = fresh(right)
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val lt = resolve(lPlan, time._1)
    val rt = resolve(rPlan, time._2)
    require(Seq(lt, rt).forall(a =>
      a.dataType == TimestampType || a.dataType == LongType),
      s"as-of time columns must be timestamp/long, got ${lt.dataType}/${rt.dataType}")
    DatasetBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(k => resolve(lPlan, k._1)), keys.map(k => resolve(rPlan, k._2)),
      lt, rt))
  }
}
