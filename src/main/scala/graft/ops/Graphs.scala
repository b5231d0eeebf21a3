package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge lists. Connected components
  * live in [[Dedup.duplicateClusters]] / `duplicateClustersFast`; this
  * adds co-occurrence graph derivation and triangle counting.
  *
  * Scale shape: triangle counting uses the degree-ordered wedge join —
  * every edge is directed from its lower-(degree, id) endpoint to the
  * higher, which caps every vertex's out-degree at O(√m) regardless of
  * how skewed the raw degree distribution is (a vertex with out-degree
  * d needs d neighbors of degree ≥ its own, so d² ≤ 2m). The wedge join
  * on the source vertex — the step that explodes quadratically in the
  * naive all-directions form — is therefore bounded per key, and the
  * closing-edge join is a plain equi-join on the canonical edge key.
  */
object Graphs {

  /** Distinct undirected co-occurrence edges (u < v): items sharing a
    * group. One self-equi-join on the group key; the strict inequality
    * canonicalizes and drops loops before `distinct` dedups multiplicity.
    */
  def coOccurrenceEdges(
      df: DataFrame,
      groupCol: String,
      itemCol: String): DataFrame = {
    val a = df.select(col(groupCol).as("_g"), col(itemCol).as("u"))
    val b = df.select(col(groupCol).as("_g"), col(itemCol).as("v"))
    a.join(b, "_g").filter(col("u") < col("v")).select("u", "v").distinct()
  }

  /** Per-vertex triangle counts over a canonical (u < v, distinct) edge
    * list; vertices in no triangle are absent. Sum over the column is
    * 3× the global triangle count.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("x"))
      .unionAll(edges.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val directed = edges
      .join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("t"))
    val w1 = directed.select(col("s"), col("t").as("b"))
    val w2 = directed.select(col("s"), col("t").as("c"))
    val wedges = w1.join(w2, "s").filter(col("b") < col("c"))
    val triangles = wedges.join(edges,
      col("u") === col("b") && col("v") === col("c"))
      .select(col("s").as("a"), col("b"), col("c"))
    triangles.select(col("a").as("vertex"))
      .unionAll(triangles.select(col("b").as("vertex")))
      .unionAll(triangles.select(col("c").as("vertex")))
      .groupBy("vertex").agg(count(lit(1)).as("n_triangles"))
  }
}
