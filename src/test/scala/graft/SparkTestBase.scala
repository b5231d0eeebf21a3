package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Sessions

/** Shared local session for suites (one per JVM — `Test / fork := true`
  * gives the whole test run a single forked JVM, so `getOrCreate`
  * naturally shares it).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.get("graft-test", "local[4]", 4)

  val Sf0001 = "/root/testdata/sf0.001"
  val FixtureCsv = "src/test/resources/taxi_fixture.csv"

  def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toString
  }
}
