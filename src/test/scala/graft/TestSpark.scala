package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (per-suite sessions
  * would pay JVM+context startup repeatedly).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(threads = 8, appName = "graft-test")
  val sfDir = "/root/testdata/sf0.001"
}
