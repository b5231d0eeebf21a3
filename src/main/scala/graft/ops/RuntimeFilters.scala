package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Runtime join-filter pruning: build a compact Bloom filter over the
  * build (dim) side's join keys and semi-filter the probe (fact) side
  * BEFORE its shuffle — the standard big-join accelerator at 100 TB
  * scale, where shuffling fact rows that can never match dominates the
  * join cost.
  *
  * Spark's own `InjectRuntimeFilter` rule applies this automatically but
  * only under its heuristics (creation-side size thresholds, shuffle
  * presence, one filter per plan); this operator is the explicit,
  * composable form — a pipeline author who KNOWS the dim side is
  * selective applies it unconditionally, e.g. to prune a 100 TB crawl
  * against a domain blocklist-survivor table before a repartition join.
  *
  * Exactness contract: a Bloom filter has false positives but NO false
  * negatives, so `bloomJoin` (prune, then join) returns exactly the
  * plain join's rows — false positives are eliminated by the join
  * itself. That property is what the DuckDB gate (q_bloom_join) checks:
  * its oracle spells the PLAIN join.
  *
  * Scale shape: the filter is one `TypedImperativeAggregate` row
  * (`numBits/8` bytes, default 1 MiB) computed with partial aggregation
  * on the dim side and delivered into the fact-side predicate via a
  * scalar subquery — a broadcast-like exchange of the sketch, never the
  * dim rows. `might_contain` evaluates as one xxhash64 + two bit probes
  * per fact row inside whole-stage codegen.
  */
object RuntimeFilters {

  /** `fact` reduced to rows whose `factKey` MIGHT appear among `dim`'s
    * `dimKey` values (no false negatives; false-positive rate set by
    * `numBits` vs the dim side's distinct-key count).
    *
    * `expectedItems`/`numBits` size the sketch: ~8 bits/key gives ~2%
    * false positives. Oversizing is cheap (bits, not rows) — prefer the
    * next power of two over a tight estimate.
    */
  def bloomPruned(
      fact: DataFrame,
      factKey: Column,
      dim: DataFrame,
      dimKey: Column,
      expectedItems: Long = 1000000L,
      numBits: Long = 1L << 23,
  ): DataFrame = {
    val bloomAgg = GraftShims.toColumn(
      new BloomFilterAggregate(
        GraftShims.toExpr(xxhash64(dimKey)),
        Literal(expectedItems),
        Literal(numBits)).toAggregateExpression())
    // scalar subquery: the sketch stays an executor-computed single-row
    // aggregate wired straight into the predicate — no driver collect,
    // so the filter build participates in the one job/plan (and AQE can
    // reuse the exchange if the dim side feeds the join too)
    val bloom = GraftShims.toExpr(
      dim.select(bloomAgg.as("bf")).scalar())
    fact.filter(GraftShims.toColumn(
      BloomFilterMightContain(bloom, GraftShims.toExpr(xxhash64(factKey)))))
  }

  /** Bloom-pruned equi-join: prune `fact` with a sketch of `dim`'s keys,
    * then run the plain inner join — result is row-identical to the
    * unpruned join, but only might-match fact rows reach the join
    * shuffle.
    */
  def bloomJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long = 1000000L,
      numBits: Long = 1L << 23,
  ): DataFrame = {
    val pruned = bloomPruned(fact, col(factKey), dim, col(dimKey),
      expectedItems, numBits)
    pruned.join(dim, col(factKey) === dim(dimKey))
  }
}
