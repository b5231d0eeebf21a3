package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Sessions

/** r14 optimization probe (guide §2.3): does frontier-delta Bellman–Ford
  * — relaxing only vertices whose distance improved last round instead
  * of the full distance table — beat [[graft.ops.Graphs.sssp]]'s
  * full-relaxation rounds on the registry's co-purchase graph?
  *
  * Measurement tool only (unregistered; results are compared for
  * equality against the committed operator each run). The verdict and
  * numbers live in OPTIMIZATION_r14.md.
  */
object ProbeSssp {

  /** Frontier-delta variant: per round, only last round's improved
    * vertices join the edge list; the min-merge against the running
    * dist table computes both the new table and the next frontier.
    */
  def ssspFrontier(edges: DataFrame, source: Long, maxRounds: Int = 64): DataFrame = {
    val e = edges.select(col("u"), col("v"), col("w").cast("long"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v"),
        col("w").cast("long")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("u").as("x")).distinct()
    var dist = verts.filter(col("x") === source)
      .select(col("x"), lit(0L).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var frontier = dist
    var rounds = 0
    var done = false
    while (!done) {
      val relaxed = frontier.withColumnRenamed("x", "u")
        .join(e, Seq("u"))
        .select(col("v").as("x"), (col("d") + col("w")).as("d"))
        .groupBy("x").agg(min(col("d")).as("nd"))
      // one pass computes the merged table AND flags improvements
      var merged = dist.join(relaxed, Seq("x"), "full")
        .select(col("x"),
          least(coalesce(col("d"), lit(Long.MaxValue)),
            coalesce(col("nd"), lit(Long.MaxValue))).as("d"),
          (col("d").isNull || (col("nd").isNotNull && col("nd") < col("d")))
            .as("_improved"))
      if (rounds % 8 == 7) merged = merged.localCheckpoint(eager = false)
      merged = merged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nImproved = merged.filter(col("_improved")).count()
      val nextFrontier = merged.filter(col("_improved")).select(col("x"), col("d"))
      dist.unpersist()
      frontier.unpersist()
      dist = merged.select(col("x"), col("d"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      frontier = nextFrontier
      merged.unpersist()
      done = nImproved == 0
      rounds += 1
      if (!done && rounds >= maxRounds)
        throw new IllegalStateException(s"ssspFrontier: no fixpoint in $maxRounds rounds")
    }
    System.err.println(s"[probe] ssspFrontier rounds=$rounds")
    val out = graft.util.Lineage.checkpoint(
      verts.join(dist, Seq("x"), "left").select(col("x"), col("d").as("dist")))
    dist.unpersist(blocking = false)
    e.unpersist(blocking = false)
    out.df
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.get("graft-probe-sssp", s"local[$cpus]", cpus.toInt)
    def edges = graft.ops.Graphs.coOccurrenceEdges(
        Tables.table(spark, sfDir, "lineitem"), "l_orderkey", "l_partkey")
      .withColumn("w", (lit(1) + (col("u") + col("v")) % 5).cast("long"))
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm-up both paths (JIT/codegen), then alternate timed runs
    graft.ops.Graphs.sssp(edges, 0L).count()
    ssspFrontier(edges, 0L).count()
    // equality check: identical (x, dist) multiset
    val a = graft.ops.Graphs.sssp(edges, 0L)
    val b = ssspFrontier(edges, 0L)
    val diff = a.unionAll(b).groupBy("x", "dist").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    println(s"[probe] result diff rows=$diff (0 = identical)")
    for (i <- 1 to 3) {
      timed(s"baseline_full_relax_$i")(graft.ops.Graphs.sssp(edges, 0L).count())
      timed(s"frontier_delta_$i")(ssspFrontier(edges, 0L).count())
    }
    spark.stop()
  }
}
