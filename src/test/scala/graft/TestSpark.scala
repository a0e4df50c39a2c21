package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single test JVM). */
object TestSpark {
  val sf: String = "/root/testdata/sf0.001"
  lazy val spark: SparkSession = {
    val s = GraftSession.get("local[8]")
    s
  }
}
