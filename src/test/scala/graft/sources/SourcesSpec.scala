package graft.sources

import graft.SparkTestBase

/** Source-layer contracts: the one-pass explicit-schema CSV read is a
  * drop-in for the inference path (SURVEY.md §7.3 production upgrade).
  */
class SourcesSpec extends SparkTestBase {

  test("csvTyped with the inferred schema yields identical rows to csvInfer") {
    val inferred = Tables.csvInfer(spark, FixtureCsv)
    val typed = Tables.csvTyped(spark, FixtureCsv, inferred.schema)
    assert(typed.schema == inferred.schema)
    assert(typed.count() == inferred.count())
    assert(typed.exceptAll(inferred).isEmpty && inferred.exceptAll(typed).isEmpty)
  }

  test("events reader normalizes nanos timestamps to TimestampType") {
    val ev = Tables.events(spark, Sf0001)
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    assert(ev.count() > 0)
  }
}
