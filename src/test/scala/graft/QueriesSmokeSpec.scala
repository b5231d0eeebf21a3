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

  /** Pinned registry size: a module dropping out of the `++` chain in
    * SparkEntry (or a key collision between modules silently shadowing a
    * query) must fail loudly here, not as a quiet shrink of the driver's
    * correctness report. Update the constant when adding queries.
    */
  test("registry size is pinned (no silent gate dropouts)") {
    assert(SparkEntry.queries.size === 240,
      s"registry has ${SparkEntry.queries.size} queries; expected 240 — " +
        "if you added/removed queries update this pin deliberately")
  }
}
