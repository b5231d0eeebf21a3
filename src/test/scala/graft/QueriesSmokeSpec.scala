package graft

/** t1 smoke: every declared query builds, runs, and returns rows at
  * sf0.001 (the driver's smoke gate shape).
  */
class QueriesSmokeSpec extends SparkTestBase {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, Sf0001).count() > 0)
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
