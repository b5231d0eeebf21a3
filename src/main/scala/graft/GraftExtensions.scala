package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Builder-time installation of the engine's custom machinery — the
  * standard deployment path for clusters where the application does not
  * own the session builder:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Installs the native as-of join planner strategy
  * ([[graft.plans.AsOfJoinStrategy]]) and every custom SQL function
  * ([[graft.functions.SqlFunctions.builders]]). Equivalent to what
  * [[graft.util.Sessions.get]] wires inline and
  * [[graft.util.Sessions.tune]] retrofits onto already-built sessions —
  * three entry points, one source of truth, so a cluster-config install,
  * a programmatic build, and a harness-supplied session all expose the
  * identical surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    graft.functions.SqlFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
  }
}
