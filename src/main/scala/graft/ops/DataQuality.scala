package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit (the Deequ idea, engine
  * form): a pipeline declares constraints over a table — completeness,
  * uniqueness, bounds, accepted values, referential integrity — and the
  * audit computes every metric and a pass verdict in as few passes as
  * the constraint mix allows.
  *
  * At 100 TB the design constraint is pass count, not metric math: all
  * scalar constraints (`completeness`/`unique`/`bounds`/`accepted`)
  * fold into ONE aggregate over the table (one scan, map-side partial
  * aggregation, a single 1-row result), then melt into the
  * (check, metric, pass) report shape. Only referential checks add
  * work: one anti-join aggregate per referenced dimension — the
  * unavoidable shape, since orphan detection IS a join (and a
  * broadcast one when the dim's key set fits).
  *
  * Each constraint's `metric` is its violation-oriented measure
  * (null fraction, duplicate count, out-of-range count, orphan count),
  * so `pass` is always `metric` compared against the declared limit and
  * a report row is meaningful without knowing the check's internals.
  */
object DataQuality {

  sealed trait Check { def name: String }

  /** Fraction of non-null values in `column` must be ≥ `minRatio`. */
  final case class Complete(column: String, minRatio: Double = 1.0) extends Check {
    val name = s"complete:$column"
  }

  /** `column` must have no duplicate non-null values (metric: excess
    * rows beyond one per distinct value — count minus count-distinct,
    * so a value occurring twice contributes 1, not 2).
    */
  final case class Unique(column: String) extends Check {
    val name = s"unique:$column"
  }

  /** All non-null values of `column` inside [lo, hi] (metric: count
    * outside).
    */
  final case class Bounds(column: String, lo: Double, hi: Double) extends Check {
    val name = s"bounds:$column"
  }

  /** All non-null values of `column` drawn from `allowed` (metric: count
    * outside the set).
    */
  final case class Accepted(column: String, allowed: Seq[String]) extends Check {
    val name = s"accepted:$column"
  }

  /** Every non-null `column` value must exist in `dim`'s `dimKey`
    * (metric: orphan row count). The referential-integrity check.
    */
  final case class Referential(column: String, dim: DataFrame, dimKey: String)
      extends Check {
    val name = s"ref:$column"
  }

  /** Arbitrary row predicate — rows violating `predicate` count as the
    * metric. The escape hatch for table-specific invariants
    * (cross-column relations, conditional rules) that still folds into
    * the single scalar aggregate pass.
    */
  final case class Custom(label: String, predicate: Column) extends Check {
    val name = s"custom:$label"
  }

  /** Run the audit: one report row per check —
    * (check, metric double, pass boolean) ordered by check name.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val n = count(lit(1)).cast("double")
    // every scalar check contributes one aggregate expression to a
    // single pass over df; each yields a (name, metric, limit-compare)
    // struct so the one result row melts into report rows
    val scalarStructs: Seq[Column] = checks.collect {
      case c @ Complete(columnName, minRatio) =>
        val nullFrac = (n - count(col(columnName)).cast("double")) / n
        struct(lit(c.name).as("check"), nullFrac.as("metric"),
          (nullFrac <= lit(1.0 - minRatio)).as("pass"))
      case c @ Unique(columnName) =>
        // excess rows beyond one per distinct value (a value seen twice
        // contributes 1, not 2): count minus distinct
        val dupRows = (count(col(columnName)) -
          count_distinct(col(columnName))).cast("double")
        struct(lit(c.name).as("check"), dupRows.as("metric"),
          (dupRows === 0.0).as("pass"))
      case c @ Bounds(columnName, lo, hi) =>
        val outside = sum(
          when(col(columnName) < lo || col(columnName) > hi, 1L)
            .otherwise(0L)).cast("double")
        struct(lit(c.name).as("check"), outside.as("metric"),
          (outside === 0.0).as("pass"))
      case c @ Accepted(columnName, allowed) =>
        val outside = sum(
          when(col(columnName).isNotNull &&
            !col(columnName).isin(allowed: _*), 1L).otherwise(0L)).cast("double")
        struct(lit(c.name).as("check"), outside.as("metric"),
          (outside === 0.0).as("pass"))
      case c @ Custom(_, predicate) =>
        // null predicate results (SQL three-valued logic) count as
        // violations: a constraint that can't evaluate didn't hold
        val violations = sum(
          when(coalesce(predicate, lit(false)), 0L).otherwise(1L)).cast("double")
        struct(lit(c.name).as("check"), violations.as("metric"),
          (violations === 0.0).as("pass"))
    }
    val scalarReport =
      if (scalarStructs.isEmpty) None
      else Some(
        df.agg(array(scalarStructs: _*).as("checks"))
          .select(explode(col("checks")).as("c"))
          .select(col("c.check"), col("c.metric"), col("c.pass")))
    // referential checks: one LEFT ANTI join each — orphans are fact
    // rows whose key misses the dim. Null keys are not orphans (SQL FK
    // convention); anti join keeps them, so subtract via isNotNull.
    val refReports = checks.collect { case c @ Referential(columnName, dim, dimKey) =>
      val orphans = df.select(col(columnName))
        .join(dim.select(col(dimKey).as(columnName)), Seq(columnName), "left_anti")
        .filter(col(columnName).isNotNull)
        .agg(count(lit(1)).cast("double").as("metric"))
      orphans.select(lit(c.name).as("check"), col("metric"),
        (col("metric") === 0.0).as("pass"))
    }
    (scalarReport.toSeq ++ refReports)
      .reduce(_.unionAll(_))
      .orderBy("check")
  }

  /** Functional-dependency audit: for each declared candidate
    * `lhs → rhs`, does every lhs-group determine a single rhs value?
    * The schema-inference / key-discovery primitive behind "is this
    * column derivable?", "is (a,b) a business key?", and
    * denormalization safety checks.
    *
    * Per candidate: total lhs groups, groups holding >1 distinct rhs
    * (violations), the worst group's distinct-rhs count, and the
    * verdict. Null handling is SQL-grouping semantics: NULL is one
    * lhs-group value; NULL rhs values are ignored by count(DISTINCT)
    * on both engines, so an all-null rhs group trivially holds.
    *
    * Scale shape: one hash aggregate per candidate keyed on its lhs
    * (count-distinct of rhs is partial-aggregable), then a 1-row
    * reduction — no joins, no windows. Candidates are independent
    * scans; callers batching many FDs over one giant table should
    * group candidates by shared lhs prefixes, but the audit itself
    * never exceeds one shuffle per candidate.
    */
  def fdAudit(df: DataFrame, fds: Seq[(Seq[String], String)]): DataFrame = {
    require(fds.nonEmpty, "fdAudit needs at least one candidate FD")
    fds.map { case (lhs, rhs) =>
      val fdName = s"${lhs.mkString(",")} -> $rhs"
      df.groupBy(lhs.map(col): _*)
        .agg(countDistinct(col(rhs)).as("_nd"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("violating_groups"),
          max("_nd").as("max_distinct_rhs"))
        .select(
          lit(fdName).as("fd"),
          col("n_groups"), col("violating_groups"), col("max_distinct_rhs"),
          (col("violating_groups") === 0L).as("holds"))
    }.reduce(_.unionAll(_)).orderBy("fd")
  }
}
