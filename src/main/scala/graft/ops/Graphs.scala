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
    *
    * The edge list is persisted and counted once up front: it feeds
    * four downstream passes (degrees, both wedge sides, the closing
    * join), and an arbitrary caller plan — e.g. a co-occurrence
    * self-join — must not be recomputed per pass. When the graph fits
    * (`m ≤ broadcastCloseMaxEdges`), the closing join broadcasts the
    * edge list so the wedge stream — the quadratic side — never
    * shuffles; past the threshold it degrades to the shuffle equi-join,
    * which is the only 100 TB-viable form.
    */
  def triangleCounts(
      edges: DataFrame,
      broadcastCloseMaxEdges: Long = 8000000L): DataFrame = {
    val e = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = e.count()
    val deg = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val directed = e
      .join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("t"))
    // explicit partition count: the directed list is small (~MBs) so
    // AQE would coalesce its exchange to one partition — and with it
    // the 30×-larger join OUTPUT, serializing the quadratic step. An
    // explicit repartition is exempt from AQE coalescing. The count
    // scales with the measured edge count (the wedge output it feeds
    // grows ~m^1.5): a fixed 32 at 10× the edges meant 10× the wedge
    // volume per partition and spill-bound tasks (observed 33× runtime
    // for 10× data at the sf1 scale point — superlinear from memory
    // pressure, not from the algorithm).
    val conf = edges.sparkSession.sessionState.conf.numShufflePartitions
    val nPart = math.max(conf, math.min(4096L, m / 100000L).toInt)
    val keyed = directed.repartition(nPart, col("s"))
    val w1 = keyed.select(col("s"), col("t").as("b"))
    val w2 = keyed.select(col("s"), col("t").as("c"))
    val wedges = w1.join(w2, "s").filter(col("b") < col("c"))
    // past the broadcast threshold, force a shuffled HASH join: the
    // default sort-merge would SORT the wedge stream — the one
    // intermediate that must never be materialized per-ordering; the
    // hash table builds on the edge side, which is √(wedges) smaller
    val closing = if (m <= broadcastCloseMaxEdges) broadcast(e)
      else e.hint("shuffle_hash")
    val triangles = wedges.join(closing,
      col("u") === col("b") && col("v") === col("c"))
      .select(col("s").as("a"), col("b"), col("c"))
    // explode, not a 3-way union: union branches would re-evaluate the
    // whole wedge pipeline once each (no cross-branch subplan sharing)
    triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-iteration PageRank over an undirected canonical (u < v,
    * distinct) edge list, treated as a symmetric directed graph.
    *
    * Determinism discipline (same as [[Clustering.kmeans]]): each
    * contribution r/outdeg is one double division; the per-target sum —
    * the only order-dependent reduction — rides DECIMAL(38,20), so
    * partial aggregation order is invisible; the damping update is a
    * fixed double expression. Constants are interpolated from the SAME
    * Scala doubles into the oracle SQL, so e.g. 1−0.85 (which is NOT
    * the double 0.15) agrees bit-for-bit cross-engine.
    *
    * @return (x, r) — vertex and rank; ranks sum to 1 over the graph
    *         (symmetric graphs have no dangling mass).
    */
  def pageRank(
      edges: DataFrame,
      damping: Double = 0.85,
      iters: Int = 3,
      checkpointEvery: Int = 8): DataFrame = {
    val directed = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    val deg = directed.groupBy("u").agg(count(lit(1)).as("od"))
    // CACHE the loop-invariant frames, lazily. A fully uncached
    // iteration tree re-evaluates the edge input (often itself an
    // expensive self-join, e.g. the co-purchase graph) at every
    // generation level — iteration i's plan embeds iterations 1..i−1
    // whole, so edge-derivation cost grows with iters². The cache
    // populates during the caller's ONE action (iteration 1's stages
    // compute the blocks; later iterations' stages read them), so no
    // eager driver-side jobs are added — profiled 3.2× faster than
    // eagerly localCheckpoint-ing each generation (which pays a
    // scheduler round-trip + block write + codegen break per round).
    // Blocks are freed by the ContextCleaner once the returned frame is
    // unreachable.
    val outgoing = directed.join(deg, "u").cache()
    val verts = directed.select(col("u").as("x")).distinct().cache()
    val n = verts.agg(count(lit(1)).as("n"))
    var ranks = verts.crossJoin(broadcast(n))
      .select(col("x"), (lit(1.0) / col("n")).as("r"))
    // high-iteration lineage guard: generations past `checkpointEvery`
    // ROTATE through local checkpoints (graft.util.Lineage) so a 50-iter
    // run neither overflows the planner with a 50-deep tree nor holds
    // more than one |V|-sized generation of blocks. Small runs (the
    // common analytics shape) never pay the materialization.
    var gen: Option[graft.util.Lineage.Gen] = None
    for (i <- 1 to iters) {
      val sums = ranks
        .join(outgoing, col("x") === col("u"))
        .select(col("v").as("x"), (col("r") / col("od")).as("cr"))
        .groupBy("x")
        .agg(sum(col("cr").cast("decimal(38,20)")).cast("double").as("m"))
      // left join: general graphs have rank-sink vertices with no
      // in-edges (symmetric ones don't, but the operator shouldn't care)
      ranks = verts.crossJoin(broadcast(n))
        .join(sums, Seq("x"), "left")
        .select(col("x"),
          (lit(1 - damping) / col("n") +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("r"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters) {
        val next = gen match {
          case Some(g) => graft.util.Lineage.rotate(ranks, g)
          case None => graft.util.Lineage.checkpoint(ranks)
        }
        gen = Some(next)
        ranks = next.df
      }
    }
    ranks
  }

  /** DuckDB spelling of [[pageRank]] — unrolled-CTE oracle generated for
    * the same damping/iters over `edgesSql` (any SELECT producing the
    * canonical u/v columns). `finalSelect` consumes CTE `rank$iters(x, r)`
    * and the 1-row CTE `nn(n)`.
    */
  def pageRankOracleSql(
      edgesSql: String,
      damping: Double,
      iters: Int,
      finalSelect: String): String = {
    val steps = (1 to iters).map { i =>
      s"c$i AS (SELECT e.v AS x, r${i - 1}.r / deg.od AS cr " +
        s"FROM r${i - 1} JOIN e ON e.u = r${i - 1}.x JOIN deg ON deg.u = r${i - 1}.x), " +
        s"s$i AS (SELECT x, CAST(sum(CAST(cr AS DECIMAL(38,20))) AS DOUBLE) AS m " +
        s"FROM c$i GROUP BY x), " +
        s"r$i AS (SELECT verts.x, ${1 - damping} / nn.n + " +
        s"$damping * coalesce(s$i.m, 0.0) AS r " +
        s"FROM verts CROSS JOIN nn LEFT JOIN s$i ON s$i.x = verts.x)"
    }.mkString(", ")
    s"WITH eu AS ($edgesSql), " +
      "e AS (SELECT u, v FROM eu UNION ALL SELECT v AS u, u AS v FROM eu), " +
      "deg AS (SELECT u, count(*) AS od FROM e GROUP BY u), " +
      "verts AS (SELECT DISTINCT u AS x FROM e), " +
      "nn AS (SELECT count(*)::BIGINT AS n FROM verts), " +
      "r0 AS (SELECT x, 1.0 / nn.n AS r FROM verts CROSS JOIN nn), " +
      s"$steps $finalSelect"
  }

  /** k-core membership: the maximal subgraph in which every vertex has
    * degree ≥ k — the standard graph-mining prune that strips hairball
    * periphery (low-engagement vertices) before community/embedding
    * work. Computed by iterated peeling: drop every vertex of degree
    * < k, recompute degrees on the induced subgraph, repeat to
    * fixpoint (the classic Matula–Beck peel, one round per pass).
    *
    * Output: EVERY vertex of the input graph with its verdict —
    * `(x, in_core, core_degree)`, `core_degree` NULL outside the core —
    * so the result is a join-ready prune column (and never empty just
    * because the graph's degeneracy sits below k: random co-occurrence
    * graphs collapse all-or-nothing near their core number, and a gate
    * that can go empty under a scale change is a fragile gate).
    *
    * Scale shape: each round is one degree aggregate (shuffle on the
    * vertex key) and two semi-join-shaped equi-joins filtering the edge
    * list; rounds are data-dependent but small in practice (a round
    * removes EVERY sub-k vertex simultaneously, so round count is the
    * peel DEPTH, not the vertex count). Like the CC loop, each round
    * pays one scalar edge-count action for convergence detection —
    * inherent to iterate-to-fixpoint — and the edge lineage is rotated
    * through `localCheckpoint` so plans don't grow with rounds.
    * `maxRounds` is a runaway guard, not a truncation: hitting it
    * throws rather than returning a non-fixpoint.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64): DataFrame = {
    val all = edges.select("u", "v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verts = all.select(col("u").as("x"))
      .unionAll(all.select(col("v").as("x"))).distinct()
    var cur = all
    var m = cur.count()
    var rounds = 0
    var done = false
    while (!done) {
      val deg = cur.select(col("u").as("x"))
        .unionAll(cur.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val keep = deg.filter(col("d") >= k).select("x")
      var nxt = cur
        .join(keep.withColumnRenamed("x", "u"), "u")
        .join(keep.withColumnRenamed("x", "v"), "v")
        .select("u", "v")
      if (rounds % 8 == 7) nxt = nxt.localCheckpoint(eager = false)
      nxt = nxt.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m2 = nxt.count()
      cur.unpersist()
      cur = nxt
      done = m2 == m
      m = m2
      rounds += 1
      if (!done && rounds >= maxRounds)
        throw new IllegalStateException(
          s"kCore(k=$k) did not reach a fixpoint in $maxRounds rounds")
    }
    val coreDeg = cur.select(col("u").as("x"))
      .unionAll(cur.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("core_degree"))
    verts.join(coreDeg, Seq("x"), "left")
      .select(col("x"), col("core_degree").isNotNull.as("in_core"),
        col("core_degree"))
  }

  /** DuckDB spelling of [[kCore]]: an unrolled-CTE oracle with `rounds`
    * peel passes over `edgesSql` (any SELECT producing canonical
    * u < v distinct edges). `rounds` must be ≥ the fixpoint depth on
    * the data — extra passes are no-ops once stable, so overshooting is
    * safe (the k-means/PageRank unrolled-oracle discipline); the
    * engine side throws past `maxRounds`, so a too-short unroll fails
    * loudly as a hash mismatch, never silently.
    */
  def kCoreOracleSql(edgesSql: String, k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"d$i AS (SELECT x, count(*) AS d FROM " +
        s"(SELECT u AS x FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}) " +
        "GROUP BY x), " +
        s"e$i AS (SELECT u, v FROM e${i - 1} " +
        s"WHERE u IN (SELECT x FROM d$i WHERE d >= $k) " +
        s"AND v IN (SELECT x FROM d$i WHERE d >= $k))"
    }.mkString(", ")
    s"WITH e0 AS ($edgesSql), $steps, " +
      "allv AS (SELECT DISTINCT x FROM " +
      "(SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0)), " +
      s"cd AS (SELECT x, count(*)::BIGINT AS core_degree FROM " +
      s"(SELECT u AS x FROM e$rounds UNION ALL SELECT v FROM e$rounds) " +
      "GROUP BY x) " +
      "SELECT allv.x, cd.core_degree IS NOT NULL AS in_core, " +
      "cd.core_degree FROM allv LEFT JOIN cd ON cd.x = allv.x"
  }

  /** Two unrolled hops of neighborhood mean aggregation — GraphSAGE /
    * message-passing feature propagation as relational algebra: hop 1
    * gives each vertex the mean feature of its neighbors; hop 2 the
    * mean of its neighbors' hop-1 means (information from two edges
    * away, smoothed). The GNN-precompute shape: each hop is ONE
    * edge-keyed join plus ONE vertex-keyed aggregate — at 100 TB the
    * edge frame shuffles by dst once per hop, never materializing
    * multi-hop path explosions (the k-hop JOIN CHAIN this op exists to
    * avoid).
    *
    * Determinism: hop means are [[graft.queries.Det.davg]] (decimal sum
    * → one division → r6); hop 2 averages the ALREADY-r6'd hop-1
    * doubles, which are 6-dp values and therefore exact in
    * DECIMAL(25,6) — no double-rounding ambiguity. Vertices without
    * neighbors (absent from edges) report NULL hops.
    */
  def khopFeatureMeans(
      edges: DataFrame, // (u, v), u < v canonical
      features: DataFrame,
      vertexCol: String,
      featCol: String): DataFrame = {
    import graft.queries.Det.davg
    val sym = edges.select(col("u").as("src"), col("v").as("dst"))
      .union(edges.select(col("v").as("src"), col("u").as("dst")))
    val feats = features.select(
      col(vertexCol).as("dst"), col(featCol).cast("double").as("_f"))
    val h1 = sym.join(feats, "dst")
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_neighbors"), davg(col("_f")).as("h1"))
    val h2 = sym.join(
        h1.select(col("src").as("dst"), col("h1").as("_h1d")), "dst")
      .groupBy(col("src"))
      .agg(davg(col("_h1d")).as("h2"))
    features.select(col(vertexCol), col(featCol))
      .join(h1.withColumnRenamed("src", vertexCol), Seq(vertexCol), "left")
      .join(h2.withColumnRenamed("src", vertexCol), Seq(vertexCol), "left")
  }
}
