package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine determinism helpers (SURVEY.md §5.3).
  *
  * The driver hash-compares query results against DuckDB on identical
  * parquet inputs, so every floating-point aggregate must be *exactly*
  * reproducible, not merely close. Plain `avg(double)` is summation-order
  * dependent (Spark's partial/final aggregation vs DuckDB's sequential
  * scan differ in the last ulps, which can flip a 6-dp rounding). The fix:
  * route sums through DECIMAL — decimal addition is exact and
  * order-independent, and a double→DECIMAL(p,6) cast has no
  * representable tie points (x.5e-6 is never a dyadic rational), so both
  * engines produce the identical decimal, hence the identical double after
  * one final division.
  */
object Det {

  /** 6-dp rounding as pure IEEE double ops: `floor(x*1e6 + 0.5)/1e6`.
    *
    * Spark's `round` (exact BigDecimal HALF_UP) and DuckDB's `round`
    * (double multiply) disagree when the true value sits within one ulp of
    * a .5 boundary; spelling the rounding as the same double expression in
    * both engines makes it bit-identical everywhere. (Half-up-toward-+inf
    * for negatives — acceptable: match matters, not tie direction.)
    */
  def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Exactly-deterministic mean, rounded to 6 dp: decimal sum (exact,
    * order-independent) → one double division → [[r6]]. DuckDB oracle must
    * use [[Oracle.davg]] for the same expression.
    */
  def davg(c: Column): Column =
    r6(sum(c.cast("decimal(25,6)")).cast("double") / count(lit(1)))

  /** Exactly-deterministic sum of doubles, as a double rounded to 6 dp. */
  def dsum(c: Column): Column =
    r6(sum(c.cast("decimal(25,6)")).cast("double"))
}

/** DuckDB-side spellings of the same deterministic expressions, for
  * building oracle SQL strings.
  */
object Oracle {
  def r6(x: String): String = s"floor(($x)*1e6 + 0.5)/1e6"
  def davg(x: String): String =
    r6(s"CAST(sum(CAST($x AS DECIMAL(25,6))) AS DOUBLE) / count(*)")
  def dsum(x: String): String =
    r6(s"CAST(sum(CAST($x AS DECIMAL(25,6))) AS DOUBLE)")
}
