package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, CorpusQueries, DriftQueries, EvalQueries, ExtQueries, MiningQueries, PrepQueries, RefQueries, ScaleQueries, SelectionQueries, SignalQueries, SqlSurfaceQueries, StructuralQueries, TpchDeepQueries}
import graft.util.Sessions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory entries (SURVEY.md §2) to runnable
  * DataFrame builders over a testdata dir; `oracleSql` holds the DuckDB
  * equivalent for hash-checked queries (absent key ⇒ rows-only check,
  * reserved for RNG/ML ops per SURVEY.md §5.3).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Runs the
    * SURVEY §7.2 vertical slice (CSV scan → clean → join → aggregate).
    */
  def entry(spark: SparkSession): DataFrame = {
    Sessions.tune(spark)
    RefQueries.qE2e(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (RefQueries.queries ++ ExtQueries.queries ++ SqlSurfaceQueries.queries ++
      PrepQueries.queries ++ CorpusQueries.queries ++ AnalyticsQueries.queries ++
      ScaleQueries.queries ++ SelectionQueries.queries ++ TpchDeepQueries.queries ++
      DriftQueries.queries ++ MiningQueries.queries ++ EvalQueries.queries ++
      StructuralQueries.queries ++ SignalQueries.queries)
      .map { case (k, f) =>
      k -> { (s: SparkSession, dir: String) => f(Sessions.tune(s), dir) }
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    RefQueries.oracleSql ++ ExtQueries.oracleSql ++ SqlSurfaceQueries.oracleSql ++
      PrepQueries.oracleSql ++ CorpusQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      ScaleQueries.oracleSql ++ SelectionQueries.oracleSql ++ TpchDeepQueries.oracleSql ++
      DriftQueries.oracleSql ++ MiningQueries.oracleSql ++ EvalQueries.oracleSql ++
      StructuralQueries.oracleSql ++ SignalQueries.oracleSql

  /** Iterative (scripted) oracle spellings for gates whose
    * single-statement oracle cannot run at sweep scale — dumped by
    * Verify as `oracle_iter.json` for tools/check.py; the driver's own
    * compare keeps using [[oracleSql]]. See [[graft.queries.IterOracle]].
    */
  def iterativeOracles: Map[String, graft.queries.IterOracle] =
    MiningQueries.iterativeOracles
}
