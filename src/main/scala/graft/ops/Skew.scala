package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for aggregations (SCALE.md §3): when one grouping key
  * dominates (a hot date, a viral document), the single reducer owning
  * it becomes the stage's critical path. The two-phase salted form
  * splits each key across `nSalts` reducers on a deterministic row
  * hash, partially aggregates, then recombines — both phases shuffle
  * uniformly.
  *
  * Only algebraic aggregates decompose this way (count/sum/min/max and
  * avg as sum÷count); holistic ones (exact median, count-distinct) need
  * sketches instead. That constraint is the API: callers name the
  * columns, the combinator builds both phases.
  *
  * Note Spark's built-in partial aggregation already handles *uniform*
  * load map-side; salting targets the reducer-side hot-key case that
  * partial aggregation can't fix when a single key's partials all meet
  * at one reducer — relevant once per-key partial state is large
  * (collect_list-like) or AQE skew handling doesn't apply (it only
  * splits join sides, not aggregations).
  */
object Skew {

  /** count + per-column sum/avg by `keys`, salted. Results equal the
    * direct `groupBy(keys)` bit-for-bit on counts and integral sums;
    * double sums agree up to re-association (same caveat as any
    * parallel sum).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      avgCols: Seq[String],
      nSalts: Int = 16,
  ): DataFrame = {
    require(nSalts > 0)
    val acc = (sumCols ++ avgCols).distinct
    // deterministic uniform salt: hash of the full row, not rand() —
    // reruns and speculative tasks agree
    val salted = df.withColumn(
      "_salt", pmod(hash(df.columns.map(col): _*), lit(nSalts)))
    val phase1 = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(
        count(lit(1)).as("_cnt"),
        acc.map(c => sum(col(c)).as(s"_sum_$c")): _*)
    val finalAggs =
      Seq(sum(col("_cnt")).as("n")) ++
        sumCols.map(c => sum(col(s"_sum_$c")).as(s"sum_$c")) ++
        avgCols.map(c => (sum(col(s"_sum_$c")) / sum(col("_cnt"))).as(s"avg_$c"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed fact side: the fact table's hot join
    * key no longer lands on one reducer — each fact row carries a
    * deterministic row-hash salt in [0, nSalts), and the (smaller, but
    * too big to broadcast) build side is replicated once per salt so
    * every (key, salt) pair still meets. The join key becomes
    * (key, salt): a hot key's rows spread across nSalts reducers while
    * the build side pays a bounded nSalts× duplication — the standard
    * manual skew-join for when AQE's runtime skew split doesn't apply
    * (e.g. the skew is known up front, or the stage feeds a further
    * co-partitioned op that AQE's split would break).
    *
    * Inner-join semantics are preserved exactly: every fact row has
    * exactly one salt, and exactly one replica of each matching build
    * row carries that salt. The salt mixes a row hash with the row's
    * position (`monotonically_increasing_id`), NOT the row hash alone:
    * a hot key's rows are typically byte-identical (repeated
    * boilerplate/default rows — the exact degenerate case that makes
    * the key hot), and a pure content hash would send them all to ONE
    * salt, silently undoing the spread. The positional component makes
    * placement partitioning-dependent across reruns, which is safe
    * here: the salt only ever decides WHERE a row is joined, never
    * whether or with what — the result set is identical for any salt
    * assignment.
    */
  def saltedJoin(
      fact: DataFrame,
      build: DataFrame,
      key: String,
      nSalts: Int = 16,
  ): DataFrame = {
    require(nSalts > 0)
    val saltedFact = fact.withColumn(
      "_salt",
      pmod(hash(fact.columns.map(col) :+ monotonically_increasing_id(): _*),
        lit(nSalts)))
    val replicatedBuild = build.withColumn(
      "_salt", explode(sequence(lit(0), lit(nSalts - 1))))
    saltedFact.join(replicatedBuild, Seq(key, "_salt")).drop("_salt")
  }

  /** Join-skew audit: BEFORE running an equi-join, name the keys that
    * would dominate it. Per key: left/right row counts, the join fanout
    * `n_left · n_right` (rows that key will emit), and its share of the
    * total output — the number that tells you whether [[saltedJoin]]
    * (or a key blacklist) is needed and for WHICH keys. Top `topN` by
    * fanout, deterministic tiebreak on the key.
    *
    * Scale shape: two per-key hash aggregates (each side once) and an
    * inner join of the two KEY-CARDINALITY frames — distinct-key-sized,
    * orders below either input; the 1-row total broadcasts back. The
    * audit never executes the skewed join it measures.
    */
  def joinSkewAudit(
      left: DataFrame,
      right: DataFrame,
      key: String,
      topN: Int = 20): DataFrame = {
    import graft.queries.Det.r6
    val l = left.groupBy(key).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(key).agg(count(lit(1)).as("n_right"))
    val fan = l.join(r, key)
      .withColumn("fanout", col("n_left") * col("n_right"))
    val tot = fan.agg(sum("fanout").as("_tot"))
    fan.crossJoin(broadcast(tot))
      .select(col(key), col("n_left"), col("n_right"), col("fanout"),
        r6(col("fanout").cast("double") / col("_tot")).as("share"))
      .orderBy(col("fanout").desc, col(key))
      .limit(topN)
  }
}
