package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; Spark
  * reuses it across getOrCreate calls). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession("graft-test", cores = 4)
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}
