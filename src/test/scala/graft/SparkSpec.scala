package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      // the declarative wiring under test in AsOfJoinSpec: strategies +
      // SQL functions from the extensions class, no registerAll calls
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** THE fixture dir for the shared-session suites — SharedEndpoint
    * serves this same dir, so wire-vs-direct asserts compare like for
    * like; change it HERE only.
    */
  val sfDir = "/root/testdata/sf0.001"
}

/** Base for all suites: one shared session, sf0.001 fixture dir. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  val sfDir = SharedSpark.sfDir
}
