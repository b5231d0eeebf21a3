package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Det.r6

/** Bitmap-index set algebra: per-group membership bitmaps over a dense
  * integer id domain, packed 63 ids per BIGINT word, with
  * intersection/union cardinalities computed by bitwise AND/OR +
  * popcount over the word frames — the audience-overlap primitive
  * ("users who did X and Y") answered from per-group states without
  * re-scanning the fact table, the same pre-aggregate-then-merge
  * contract as [[Stats.kmvUnionEstimate]] but EXACT, for domains dense
  * enough to bitmap (user ids, product ids; not strings).
  *
  * 63 bits per word, not 64: DuckDB's `<<` range-checks BIGINT, so bit
  * 63 (the sign bit) would throw in the oracle replay; 63 keeps every
  * word arithmetic-safe in both engines at a 1.6% density cost.
  *
  * Scale shape: the build is one (group, word) hash aggregate whose
  * key space is groups × ⌈domain/63⌉ — bounded by the id domain, not
  * the event count; map-side bit_or collapses each task's events into
  * words before the shuffle. The pair join runs on the word-keyed
  * bitmap frames (groups × words rows), orders below the fact table.
  */
object Bitmap {

  private val WordBits = 63

  /** Per-(group, word) membership bitmap: word w holds ids
    * [63w, 63w+62] as bits via `bit_or(1 << (id % 63))`. Requires
    * non-negative ids.
    */
  def build(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.select(col(groupCol).as("g"),
        expr(s"cast($idCol as bigint) div $WordBits").as("word"),
        expr(s"shiftleft(cast(1 as bigint), " +
          s"cast($idCol % $WordBits as int))").as("_bit"))
      .groupBy("g", "word")
      .agg(expr("bit_or(_bit)").as("bits"))

  /** Pairwise overlap report from a bitmap frame: for each unordered
    * group pair, exact member counts, intersection, union, and Jaccard.
    * Words absent on one side contribute nothing to AND and everything
    * to OR — the full-outer word join with zero-coalesce spells that.
    */
  def overlap(bitmaps: DataFrame): DataFrame = {
    val sizes = bitmaps.groupBy("g")
      .agg(sum(expr("bit_count(bits)")).cast("long").as("n"))
    val a = bitmaps.select(col("g").as("g_a"), col("word"), col("bits").as("_ba"))
    val b = bitmaps.select(col("g").as("g_b"), col("word"), col("bits").as("_bb"))
    val common = a.join(b, Seq("word"))
      .filter(col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b")
      .agg(sum(expr("bit_count(_ba & _bb)")).cast("long").as("_nc"))
    // seed from the full group-pair frame so disjoint pairs (no shared
    // word) still report n_common = 0 instead of vanishing
    val allPairs = sizes.select(col("g").as("g_a"), col("n").as("n_a"))
      .join(sizes.select(col("g").as("g_b"), col("n").as("n_b")),
        col("g_a") < col("g_b"))
    allPairs
      .join(broadcast(common), Seq("g_a", "g_b"), "left")
      .withColumn("n_common", coalesce(col("_nc"), lit(0L)))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"), col("n_common"),
        (col("n_a") + col("n_b") - col("n_common")).as("n_union"),
        r6(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }
}
