package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity join via deletion neighborhoods (the
  * SymSpell scheme): all value pairs within Levenshtein distance 1,
  * with EXACT recall, without the all-pairs join.
  *
  * The key set of a string is itself plus every single-character
  * deletion. If lev(a, b) ≤ 1 the key sets intersect: equal strings
  * share themselves; an insertion/deletion pair (|a|+1 = |b|) shares a
  * — deleting the inserted character from b yields a, which is in both
  * sets; a substitution pair shares the string with the substituted
  * position deleted from BOTH. So the equi-join on deletion keys is a
  * complete candidate generator, and the per-pair `levenshtein` check
  * removes the false positives (distance-2 pairs can also collide,
  * e.g. two different substitutions at the same position).
  *
  * Scale shape: the key explosion is ×(len+1) — linear in corpus
  * BYTES, not rows² — and bucket sizes are bounded by how many strings
  * share a deletion (for ID-like strings, the alphabet size at one
  * position). One shuffle on the key, candidate distinct, one narrow
  * verify. The brute-force O(n²) plan never appears; the correctness
  * oracle IS that brute force, so recall is proven, not assumed.
  */
object EditSim {

  /** All (w1 < w2) pairs of distinct `wordCol` values with
    * levenshtein ≤ 1. Empty strings participate (their key set is just
    * themselves; they pair with single-character strings via the
    * latter's deletion).
    */
  def edit1Pairs(df: DataFrame, wordCol: String): DataFrame = {
    val words = df.select(col(wordCol).cast("string").as("w"))
      .filter(col("w").isNotNull).distinct()
    // the word itself ∪ its one-deletion variants; array_union dedups
    // repeated-character deletions ("aa" → "a" once)
    val keyed = words.select(col("w"), explode(array_union(
      array(col("w")),
      expr("transform(sequence(1, length(w)), " +
        "i -> concat(substring(w, 1, i-1), substring(w, i+1, length(w))))")
    )).as("k"))
    keyed.select(col("w").as("w1"), col("k"))
      .join(keyed.select(col("w").as("w2"), col("k")), "k")
      .filter(col("w1") < col("w2"))
      .select("w1", "w2").distinct()
      .filter(levenshtein(col("w1"), col("w2")) <= 1)
  }
}
