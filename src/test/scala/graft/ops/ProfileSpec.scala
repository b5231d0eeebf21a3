package graft.ops

import graft.SparkTestBase

/** Profile.numeric on a crafted frame with known exact statistics,
  * including null exclusion and discrete (actual-data-value) quartiles.
  */
class ProfileSpec extends SparkTestBase {

  import spark.implicits._

  test("numeric: exact counts, range, and discrete quartiles; nulls excluded") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 10.0), (3.0, null), (4.0, 40.0))
      .toDF("a", "b")
    val p = Profile.numeric(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = p("a")
    assert(a.getLong(1) == 4 && a.getLong(2) == 4) // n_nonnull, n_distinct
    assert(a.getDouble(3) == 1.0 && a.getDouble(4) == 4.0)
    // percentile_disc picks actual members: sorted(1,2,3,4) → ceil(p*4)
    assert(a.getDouble(5) == 1.0 && a.getDouble(6) == 2.0 && a.getDouble(7) == 3.0)
    val b = p("b")
    assert(b.getLong(1) == 3 && b.getLong(2) == 2) // null excluded
    assert(b.getDouble(5) == 10.0 && b.getDouble(6) == 10.0 && b.getDouble(7) == 40.0)
  }
}
