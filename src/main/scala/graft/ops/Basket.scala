package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Det.r6

/** Market-basket association mining: pairwise co-occurrence support /
  * confidence / lift over (basket, item) membership — the co-purchase
  * ("customers who bought X also bought Y") staple, and for corpus work
  * the document×tag / query×click companion of [[TextAnalysis.pmiBigrams]]
  * (which scores ADJACENCY in text; this scores set co-membership).
  *
  * Scale shape: the only super-linear step is the within-basket pair
  * self-join, whose fanout is Σ |basket|² — bounded when basket sizes
  * are (orders, carts, docs-per-user all are); a pathological basket is
  * exactly what [[Skew.joinSkewAudit]] names in advance, and the fix is
  * capping basket size upstream, not salting (a basket's pairs are
  * irreducibly one key's work). Everything after the pair count is
  * item-cardinality-sized.
  *
  * Determinism: supports and counts are exact integers; confidence and
  * lift are ONE double division off exact integer products, then r6 —
  * and the top-N cut orders by (lift DESC, item_a, item_b), a total
  * order, so the boundary is cross-engine exact.
  */
object Basket {

  /** Top-`topN` item pairs by lift among pairs co-occurring in at least
    * `minPairCount` baskets. Emits per pair: co-occurrence count, each
    * item's basket count, support = n_ab/n_baskets, confidence
    * a→b = n_ab/n_a, and lift = (n_ab·n_baskets)/(n_a·n_b).
    */
  def pairAssociations(
      df: DataFrame,
      basketCol: String,
      itemCol: String,
      minPairCount: Long = 2,
      topN: Int = 50): DataFrame = {
    // presence, not multiplicity: an item twice in one basket is one
    // co-occurrence, the standard support definition
    val bi = df.select(col(basketCol).as("_bk"), col(itemCol).as("_it")).distinct()
    val nBaskets = bi.select(countDistinct(col("_bk")).as("_nb"))
    val itemCounts = bi.groupBy(col("_it")).agg(count(lit(1)).as("_n_item"))
    val pairs = bi.as("x")
      .join(bi.as("y"),
        col("x._bk") === col("y._bk") && col("x._it") < col("y._it"))
      .groupBy(col("x._it").as("item_a"), col("y._it").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.withColumnRenamed("_it", "item_a")
        .withColumnRenamed("_n_item", "n_a"), "item_a")
      .join(itemCounts.withColumnRenamed("_it", "item_b")
        .withColumnRenamed("_n_item", "n_b"), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(
        col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        r6(col("n_ab").cast("double") / col("_nb")).as("support"),
        r6(col("n_ab").cast("double") / col("n_a")).as("confidence"),
        r6((col("n_ab") * col("_nb")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(topN)
  }
}
