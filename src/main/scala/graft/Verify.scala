package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER overrides the in-process master — the
    // multi-process evidence hook (round-12 verdict #3): with
    // `local-cluster[n,c,mem]` the SAME gate runs against real executor
    // JVMs (Netty shuffle, torrent broadcast, serialized task
    // closures); SPARK_GRAFT_JARS ships the packaged engine jar to
    // those executors, SPARK_GRAFT_EXEC_MEM sizes their heaps.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => builder.config("spark.jars", j))
    sys.env.get("SPARK_GRAFT_EXEC_MEM")
      .foreach(m => builder.config("spark.executor.memory", m))
    val spark = builder
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      // see Bench: prompt shuffle-file reclamation for iterative jobs
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // released rank/edge snapshots WARN about truncated lineage on every
    // unpersist (intentional: retired checkpoints are never re-read) —
    // mute the RDD loggers so the noise can't interleave bench output
    org.apache.logging.log4j.core.config.Configurator
      .setLevel("org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated query-name filter for fast local iteration
    // (unset when the driver runs this — full dump).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // A failed query must be VISIBLE in the gate, not silently absent
    // (round-6 post-mortem: four analysis-broken queries simply vanished
    // from CORRECTNESS_r06.json and the gate still read 100%). Collect
    // per-query errors and dump them as errors.json next to the results
    // so every caller — presnapshot, driver, human — sees the breakage.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
      }
      // Per-query isolation: localCheckpoint blocks (PageRank rounds,
      // stream stores) persist for the SESSION, so without this each
      // query's pinned blocks shrink the execution pool available to
      // the next — at sf10 the accumulated storage from 12 earlier
      // queries starved q130's hash aggregation into
      // AGGREGATE_OUT_OF_MEMORY. The driver's gate semantics are
      // independent queries; make the memory semantics match.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(
        _.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v.take(2000))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // Exit 0 even on failures: a non-zero rc could make the driver
    // discard the WHOLE dump (round-5 bench rc=1 recorded nothing) —
    // the partial results plus errors.json are strictly more
    // informative. tools/presnapshot.sh fails the gate when
    // errors.json is non-empty.
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} QUERIES FAILED: " +
        errors.keys.mkString(", "))
    spark.stop()
  }
}
