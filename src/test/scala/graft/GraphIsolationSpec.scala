package graft

import java.sql.DriverManager

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Round-10 verdict #3: the fact-scaled shuffle width for graph builds
  * must not leak into plans the SAME SparkSession compiles concurrently
  * — the BI endpoint plans thrift clients' queries on it. The engine
  * now runs widened graph builds on a `newSession()` (own SQLConf,
  * shared context/catalog); this spec forces the wide path on fixture
  * data (`spark.graft.graph.minShuffleWidth`), drives a live thrift
  * client DURING the build, and asserts (a) the caller session's
  * shuffle width never moves, (b) the client's wire results equal
  * direct evaluation, and (c) the wide-path q130 answer is
  * bit-identical to the narrow-path answer.
  */
class GraphIsolationSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("forced-wide graph build leaves a concurrent thrift client's session untouched") {
    val narrow = rows(Registry.byName("q130_pagerank").run(spark, sfDir))
    assert(narrow.nonEmpty)
    val baseWidth = spark.conf.get("spark.sql.shuffle.partitions")
    SharedEndpoint.port // the JVM's one thrift endpoint (see its doc)
    spark.conf.set("spark.graft.graph.minShuffleWidth", "48")
    try {
      // the graph build in flight on its own thread (wide path:
      // newSession at width 48, columnar edge cache, parquet staging)
      val wideOut = new java.util.concurrent.atomic.AtomicReference[Seq[(Long, String, Long)]]()
      val buildErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val build = new Thread(() => {
        try wideOut.set(rows(Registry.byName("q130_pagerank").run(spark, sfDir)))
        catch { case t: Throwable => buildErr.set(t) }
      })
      build.start()

      // a REAL external client during the build: wire counts must match
      // direct evaluation, and the serving session's width must never
      // move off its configured value while the wide build runs
      val conn = SharedEndpoint.connect()
      try {
        val st = conn.createStatement()
        var probes = 0
        while (build.isAlive && probes < 200) {
          val rs = st.executeQuery(
            "SELECT count(*) AS n FROM global_temp.orders")
          assert(rs.next() &&
            rs.getLong("n") == Tables.orders(spark, sfDir).count())
          assert(spark.conf.get("spark.sql.shuffle.partitions") == baseWidth,
            "graph build leaked its widened shuffle conf into the shared session")
          probes += 1
        }
        assert(probes > 0)
      } finally conn.close()
      build.join(300000)
      assert(!build.isAlive, "graph build did not finish")
      assert(buildErr.get() == null, s"wide build failed: ${buildErr.get()}")
      // same answer on both paths: the width/caching/staging regime is
      // physical only
      assert(wideOut.get() == narrow)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == baseWidth)
    } finally spark.conf.unset("spark.graft.graph.minShuffleWidth")
  }
}
