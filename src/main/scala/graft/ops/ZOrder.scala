package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for 2-D file skipping — the data-layout
  * half of the 100 TB posture: min/max column stats only prune scans
  * when values are physically clustered, and a single-column sort can
  * cluster only one dimension. Bit-interleaving two dimensions into one
  * sort key gives every z-range file a compact axis-aligned bounding
  * box, so a 2-D box predicate touches O(box perimeter) files instead
  * of every file that matches either dimension alone.
  *
  * The z-value is pure integer bit math (shift/and/or — all
  * codegen'd built-ins, no UDF), reproducible in any engine, which is
  * what lets the q127/q128 oracles replay it bit for bit.
  *
  * The write-side operator [[planZ]]/[[layoutByZ]] interleaves
  * per-dimension QUANTILE RANKS rather than raw values — the approach
  * of production z-order implementations (Delta/Iceberg OPTIMIZE
  * ZORDER BY interleave range-partition ids). Raw interleave gives the
  * dimension with larger absolute values the top bits regardless of
  * how much it actually varies (epoch days ~10k out-bit a 1.5k key
  * range), and count-equalized z ranges then cross quadrant
  * boundaries, blowing up per-file bounding boxes; rank space is
  * uniform by construction, so equal-count z ranges ARE compact
  * quadtree cells and every file gets a tight box in BOTH dimensions —
  * measured in PhysicalLayoutSpec. Rank is monotone in the value, so
  * the corner bound (prune to `[z(rank(xLo),rank(yLo)),
  * z(rank(xHi),rank(yHi))]`) stays a true superset.
  *
  * Reference behavior analogue: the reference stores plain
  * `*.parquet` drops with no clustering (transform.py writes whatever
  * pandas held); this operator is part of the beyond-reference scale
  * surface.
  */
object ZOrder {

  /** Default coordinate width: 24 bits per dimension (z fits in 48
    * bits) covers keys to 16.7M — customer keys past sf100 and epoch
    * days past year 9999. Callers with wider domains bucket first.
    */
  val Bits = 24

  /** Bit i of x moved to bit 2i: the even-position half of a Morton
    * code. Strictly monotone in x (bit significance order is
    * preserved), which is what makes the q128 corner bound valid.
    */
  def spread(x: Column, bits: Int = Bits): Column =
    (0 until bits)
      .map(i => shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
      .reduce(_.bitwiseOR(_))

  /** Morton interleave: x on even bit positions, y on odd. Monotone in
    * each coordinate with the other fixed, so for any axis-aligned box
    * every point's z lies in [zValue(xLo,yLo), zValue(xHi,yHi)] — the
    * interval a z-clustered scan reads before the exact residual
    * filter.
    */
  def zValue(x: Column, y: Column, bits: Int = Bits): Column =
    spread(x, bits).bitwiseOR(shiftleft(spread(y, bits), 1))

  /** Driver-side twin of [[zValue]] for planning cut points. */
  def zValueLong(x: Long, y: Long, bits: Int = Bits): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** A planned z-layout: the clustered frame (carrying its `z` column)
    * plus the quantile cut points that define rank space, so a reader
    * can map any query box's corners into the SAME space the files
    * were laid out in — no recomputation, no drift between writer and
    * reader.
    */
  final case class ZLayout(df: DataFrame,
                           xCuts: Array[Double], yCuts: Array[Double],
                           bits: Int) {
    /** Rank of a raw value: number of cut points at or below it.
      * Monotone non-decreasing, so box corners map to rank-space
      * corners and the Morton corner bound carries over.
      */
    def xRank(v: Double): Long = rankOf(xCuts, v)
    def yRank(v: Double): Long = rankOf(yCuts, v)

    /** The z-interval a scan of the box [xLo,xHi] x [yLo,yHi] must
      * read (superset by the per-coordinate monotonicity of rank and
      * of the Morton interleave); apply the exact box predicate as the
      * residual filter after the interval prune.
      */
    def zRange(xLo: Double, xHi: Double,
               yLo: Double, yHi: Double): (Long, Long) =
      (zValueLong(xRank(xLo), yRank(yLo), bits),
       zValueLong(xRank(xHi), yRank(yHi), bits))
  }

  private def rankOf(cuts: Array[Double], v: Double): Long = {
    var i = 0
    while (i < cuts.length && cuts(i) <= v) i += 1
    i.toLong
  }

  /** Rank a column against broadcast cut points: `size(filter(cuts,
    * c -> c <= x))` — an O(|cuts|) codegen'd scan of a literal array
    * per row, no join and no shuffle. |cuts| = nBuckets-1 (64 by
    * default), trivial next to the row's I/O cost.
    */
  private def rankCol(c: Column, cuts: Array[Double]): Column =
    size(filter(lit(cuts), cut => cut <= c.cast("double"))).cast("long")

  /** Plan a z-layout: per-dimension quantile cuts (one
    * `approxQuantile` pass over the two projected columns — the same
    * cost class as the range partitioner's own sample pass), rank both
    * dimensions against them, interleave the ranks, range-partition on
    * the z-key so each output file owns one compact z-interval, and
    * sort within partitions so parquet row groups carry tight min/max
    * stats on z and BOTH source dimensions.
    *
    * `nBuckets` is the rank-space resolution per dimension; the
    * default (4 * nFiles, so the per-file grid is 4x finer than the
    * file count in each dimension) keeps corner-bound slop to a
    * fraction of a file.
    */
  def planZ(df: DataFrame, x: Column, y: Column, nFiles: Int,
            nBuckets: Int = 0, relErr: Double = 0.001): ZLayout = {
    val b = if (nBuckets > 0) nBuckets else math.max(16, 4 * nFiles)
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1, b - 1))
    val probs = (1 until b).map(_.toDouble / b).toArray
    val proj = df.select(x.cast("double").as("_zx"), y.cast("double").as("_zy"))
    val Seq(xCuts, yCuts) =
      Seq("_zx", "_zy").map(c => proj.stat.approxQuantile(c, probs, relErr))
    val withZ = df.withColumn(
      "z", zValue(rankCol(x, xCuts), rankCol(y, yCuts), bits))
    ZLayout(
      withZ.repartitionByRange(nFiles, col("z")).sortWithinPartitions(col("z")),
      xCuts, yCuts, bits)
  }

  /** Cluster a frame for 2-D skipping; write the result with any sink.
    * [[planZ]] is the full form that also hands back the rank cuts for
    * reader-side interval pruning.
    */
  def layoutByZ(df: DataFrame, x: Column, y: Column, nFiles: Int): DataFrame =
    planZ(df, x, y, nFiles).df
}
