package graft

import graft.util.Sessions

/** Dev tool (r14 optimization round): dump `.explain("formatted")` for
  * named registry gates to `<outDir>/<gate>.txt`, so plan claims in
  * OPTIMIZATION_r14.md are checkable artifacts (`plans/r14/...`).
  * Usage: `runMain graft.PlanDump <outDir> <gate> [<gate> ...]`.
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench. The dump is
  * the pre-execution plan (AQE `isFinalPlan=false`) — the shape the
  * optimizer committed to; runtime re-optimizations are bench-side
  * evidence, not plan-shape claims.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <gate> [<gate>...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.get("graft-plandump", s"local[$cpus]", cpus.toInt)
    args.drop(1).foreach { name =>
      val txt =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch {
          case scala.util.control.NonFatal(e) =>
            s"plan dump failed for $name: $e\n"
        }
      java.nio.file.Files.writeString(outDir.resolve(s"$name.txt"), txt)
      System.err.println(s"[plandump] wrote ${outDir.resolve(s"$name.txt")}")
    }
    spark.stop()
  }
}
