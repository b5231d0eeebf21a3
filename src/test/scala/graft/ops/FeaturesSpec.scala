package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Feature-engineering operator semantics: leave-one-out exclusion and
  * the singleton fallback for target encoding; exact-discrete cuts and
  * clip accounting for winsorization. The DuckDB gates (q_target_enc /
  * q_winsorize) pin cross-engine numerics; these pin the arithmetic on
  * hand-computable fixtures.
  */
class FeaturesSpec extends SparkTestBase {

  test("targetEncodeLoo: excludes own row; singleton falls back to global LOO") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 30.0),
      (4L, "b", 100.0), // singleton category
    ).toDF("id", "cat", "y")
    val out = Features.targetEncodeLoo(df, "cat", "y")
      .select("id", "cat_enc")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // category a, LOO means: (60-10)/2=25, (60-20)/2=20, (60-30)/2=15
    assert(out(1L) == 25.0 && out(2L) == 20.0 && out(3L) == 15.0, out.toString)
    // singleton b: global LOO = (160-100)/3 = 20
    assert(out(4L) == 20.0, out(4L).toString)
  }

  test("winsorizeSummary: exact-discrete cuts, clip counts, winsorized sum") {
    import spark.implicits._
    val df = (1 to 20).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val r = Features.winsorizeSummary(df, "grp", "v", pLo = 0.1, pHi = 0.9)
      .collect()(0)
    // percentile_disc = smallest v with cume_dist >= p: 2/20 = 0.1 → 2,
    // 18/20 = 0.9 → 18
    assert(r.getAs[Double]("cut_lo") == 2.0 && r.getAs[Double]("cut_hi") == 18.0,
      r.toString)
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Long]("n_clip_lo") == 1L) // value 1
    assert(r.getAs[Long]("n_clip_hi") == 2L) // values 19, 20
    // 210 + (2−1) + (18−19) + (18−20) = 208
    assert(r.getAs[Double]("sum_winsorized") == 208.0, r.toString)
  }

  test("joinSkewAudit: fanout, share, and deterministic top order") {
    import spark.implicits._
    val left = Seq("a", "a", "b").toDF("k")
    val right = Seq("a", "a", "a", "b", "b", "b", "b", "b").toDF("k")
    val out = Skew.joinSkewAudit(left, right, "k", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // a: 2×3=6, b: 1×5=5 → total 11
    assert(out.length == 2)
    assert(out(0) == (("a", 2L, 3L, 6L, math.floor(6.0 / 11 * 1e6 + 0.5) / 1e6)))
    assert(out(1) == (("b", 1L, 5L, 5L, math.floor(5.0 / 11 * 1e6 + 0.5) / 1e6)))
  }
}
