package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (the
  * AllPairs/PPJoin family — Bayardo et al., WWW'07; Xiao et al.,
  * WWW'08): every pair of documents whose element-set Jaccard meets the
  * threshold, with EXACT recall — the deterministic complement to the
  * MinHash-LSH path ([[Dedup.nearDuplicatePairs]]), which trades recall
  * for fewer candidates.
  *
  * The filter: order all elements by ascending document frequency
  * (rarest first, ties by value — any consistent total order works);
  * each document emits only its first `|d| − ⌈t·|d|⌉ + 1` ordered
  * elements as index keys. Two sets with Jaccard ≥ t must share at
  * least one element inside BOTH prefixes (their smallest common
  * element, by a pigeonhole on the ⌈t·|d|⌉-element suffix), so the
  * equi-join on prefix elements produces a complete candidate set —
  * and prefixes built from RARE elements produce few collisions, which
  * is the whole economy of the algorithm.
  *
  * Scale shape: two vocabulary-bounded shuffles (the df count and the
  * prefix equi-join) plus one per-doc sort of its own elements — never
  * all-pairs. The candidate join keys are document frequencies' rarest
  * elements, so bucket sizes are small by construction (a key shared by
  * many docs is frequent, hence ranked late, hence outside most
  * prefixes); the degenerate all-same-document corpus degrades to the
  * LSH path's behavior and can reuse its cap-and-star strategy if
  * profiling demands.
  */
object SetSimJoin {

  /** All (id_a < id_b, jac) pairs with exact Jaccard ≥ `threshold`
    * between per-row element sets (`setCol`: array column; duplicates
    * removed here, empties dropped — an empty set has Jaccard 0 with
    * everything).
    *
    * The prefix length carries one element of slack over the textbook
    * `|d| − ⌈t·|d|⌉ + 1`: the ceiling is evaluated in IEEE doubles on
    * both engines, and a product landing one ulp above an integer would
    * otherwise shorten the prefix below the completeness bound. The
    * slack only ADDS candidates — recall is load-bearing here because
    * the correctness oracle is a brute-force all-pairs join.
    */
  def jaccardSelfJoin(
      df: DataFrame,
      idCol: String,
      setCol: Column,
      threshold: Double,
  ): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val sets = df
      .select(col(idCol).as("_id"), array_distinct(setCol).as("elems"))
      .filter(size(col("elems")) > 0)
    val elems = sets.select(col("_id"), explode(col("elems")).as("elem"))
    val dfreq = elems.groupBy("elem").agg(count(lit(1)).as("df"))
    // per-doc global ordering: sort each doc's elements by (df, elem).
    // sort_array on (df, elem) structs gives the lexicographic order
    // both engines agree on; the groupBy re-assembles the doc from the
    // df-joined element table (one vocabulary-bounded shuffle).
    val ordered = elems.join(dfreq, "elem")
      .groupBy("_id")
      .agg(sort_array(collect_list(struct(col("df"), col("elem")))).as("ranked"))
      .withColumn("sz", size(col("ranked")))
      .withColumn("plen",
        (col("sz") - ceil(lit(threshold) * col("sz")) + lit(2)).cast("int"))
    val prefix = ordered
      .select(col("_id"),
        explode(expr("transform(slice(ranked, 1, plen), x -> x.elem)")).as("elem"))
    val cand = prefix.toDF("id_a", "elem")
      .join(prefix.toDF("id_b", "elem"), Seq("elem"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cand
      .join(sets.toDF("id_a", "elems_a"), "id_a")
      .join(sets.toDF("id_b", "elems_b"), "id_b")
      .withColumn("jac", Dedup.jaccard(col("elems_a"), col("elems_b")))
      .filter(col("jac") >= threshold)
      .select("id_a", "id_b", "jac")
  }

  /** Asymmetric containment join: all ordered (id_a ≠ id_b) pairs where
    * `|A ∩ B| / |A| ≥ threshold` — A's elements are (nearly) a subset
    * of B's. The quote/excerpt detector: Jaccard misses a short
    * document copied INTO a long one (the union dwarfs the overlap);
    * containment is built for exactly that case.
    *
    * The prefix filter is one-sided, which is the asymmetry's economy:
    * A can miss at most `⌊(1−t)·|A|⌋` of its own elements, so its first
    * `|A| − ⌈t·|A|⌉ + 1` df-ranked elements (+1 ulp slack, as in
    * [[jaccardSelfJoin]]) must contain one element of ANY qualifying
    * B — but B gets no prefix (containment puts no lower bound on how
    * deep A's elements sit in B's ranking), so the probe side indexes
    * A-prefixes against B's FULL element postings. Candidates are still
    * df-bounded (a prefix element shared with many Bs is frequent,
    * hence late-ranked, hence outside most A-prefixes); the exact
    * `|A ∩ B|` verify removes false candidates. Never all-pairs.
    */
  def containmentJoin(
      df: DataFrame,
      idCol: String,
      setCol: Column,
      threshold: Double,
  ): DataFrame = {
    val sets = df
      .select(col(idCol).as("_id"), array_distinct(setCol).as("elems"))
      .filter(size(col("elems")) > 0)
    containmentCandidates(sets, threshold)
      .join(sets.toDF("id_a", "elems_a"), "id_a")
      .join(sets.toDF("id_b", "elems_b"), "id_b")
      .withColumn("cont",
        size(array_intersect(col("elems_a"), col("elems_b"))).cast("double") /
          size(col("elems_a")))
      .filter(col("cont") >= threshold)
      .select("id_a", "id_b", "cont")
  }

  /** The candidate stage of [[containmentJoin]], exposed so the
    * positional filter's pruning is directly measurable (its spec
    * asserts strictly fewer candidates than `positional = false` with
    * an identical final result). `sets` must be `(_id, elems)` with
    * distinct non-empty element arrays.
    */
  private[ops] def containmentCandidates(
      sets: DataFrame,
      threshold: Double,
      positional: Boolean = true): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold in (0,1], got $threshold")
    val elems = sets.select(col("_id"), explode(col("elems")).as("elem"))
    val dfreq = elems.groupBy("elem").agg(count(lit(1)).as("df"))
    val ranked = elems.join(dfreq, "elem")
      .groupBy("_id")
      .agg(sort_array(collect_list(struct(col("df"), col("elem")))).as("ranked"))
      .withColumn("sz", size(col("ranked")))
    // positions ride along (Xiao et al., WWW'08 §3.2 positional filter):
    // for a shared element at 1-based ranks (pa, qb) of A and B, the
    // overlap is bounded by min(pa−1, qb−1) + 1 + min(|A|−pa, |B|−qb)
    // — common elements split into strictly-before / this one /
    // strictly-after in the SHARED global (df, elem) order. Any shared
    // element whose bound can still reach t·|A| keeps the pair; the
    // filter only PRUNES candidates (the exact |A∩B| verify below is
    // unchanged), and the one-unit slack on the t·|A| comparison keeps
    // IEEE rounding from ever touching a true pair.
    val withPos = ranked
      .select(col("_id"), col("sz"),
        posexplode(expr("transform(ranked, x -> x.elem)")).as(Seq("p0", "elem")))
      .select(col("_id"), col("sz"), (col("p0") + 1).as("pos"), col("elem"))
    val prefixA = withPos
      .filter(col("pos") <=
        col("sz") - ceil(lit(threshold) * col("sz")) + lit(2))
      .select(col("_id").as("id_a"), col("sz").as("sz_a"),
        col("pos").as("pa"), col("elem"))
    val allB = withPos.select(col("_id").as("id_b"), col("sz").as("sz_b"),
      col("pos").as("qb"), col("elem"))
    val paired = prefixA.join(allB, "elem")
      .filter(col("id_a") =!= col("id_b"))
    val pruned =
      if (positional) paired.filter(
        (least(col("pa") - 1, col("qb") - 1) + lit(1) +
          least(col("sz_a") - col("pa"), col("sz_b") - col("qb")))
          .cast("double") > lit(threshold) * col("sz_a") - lit(1.0))
      else paired
    pruned.select("id_a", "id_b").distinct()
  }
}
