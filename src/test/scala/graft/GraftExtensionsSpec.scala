package graft

import org.apache.spark.sql.{GraftShims, SparkSessionExtensions}

import graft.functions.SqlFunctions
import graft.plans.AsOfJoinStrategy

/** The `spark.sql.extensions=graft.GraftExtensions` installation path
  * must expose the same surface `Sessions.get`/`tune` wire up.
  * Extensions bind at session instantiation, so the shared test session
  * can't exercise the config end-to-end; instead the spec applies the
  * class to a fresh `SparkSessionExtensions` and inspects what it would
  * install (via the GraftShims bridge to the `private[sql]` builders).
  */
class GraftExtensionsSpec extends SparkTestBase {

  test("extensions class installs the as-of strategy and every SQL function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = GraftShims.extensionStrategies(ext, spark)
    assert(strategies.exists(_ eq AsOfJoinStrategy))
    val names = GraftShims.extensionFunctionNames(ext).toSet
    assert(SqlFunctions.builders.map(_._1).toSet.subsetOf(names),
      s"missing: ${SqlFunctions.builders.map(_._1).toSet -- names}")
  }

  test("extensions and runtime registration share one builder list") {
    // the three entry points (config install, builder wiring, tune
    // retrofit) must not drift: the runtime-registered functions resolve
    // for exactly the names the extensions class injects
    SqlFunctions.register(spark)
    SqlFunctions.builders.map(_._1).foreach { name =>
      assert(
        spark.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name not registered on the live session")
    }
  }
}
