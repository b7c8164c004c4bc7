package graft

import graft.core.Graft
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — ONE `Graft.session` (same config as
  * Verify/Bench, see ADVICE.md r2 on config drift) reused across
  * suites; Spark sessions are process-wide singletons anyway.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Graft.session("graft-test")
}
