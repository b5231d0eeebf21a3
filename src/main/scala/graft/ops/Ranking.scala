package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Det.r6

/** Hybrid-retrieval rank fusion. Modern retrieval stacks run several
  * independent scorers over the corpus — lexical (BM25), dense
  * (embedding cosine), freshness, quality — and fuse their CANDIDATE
  * rankings rather than their incomparable raw scores. Reciprocal Rank
  * Fusion (Cormack, Clarke & Buettcher, SIGIR 2009) is the standard
  * score-free fusion: `fused(d) = Σ_lists 1/(k + rank_list(d))`, with
  * items absent from a list contributing nothing.
  *
  * Scale shape: fusion runs over the top-N candidate frames the
  * scorers already produce (TakeOrdered output, N ~ 10²-10³ per list
  * per query), NOT over the corpus — ranks beyond the candidate cut
  * cannot change the fused top-k by more than 1/(k+N), which is the
  * documented truncation contract of every production RRF. The rank
  * window therefore orders a bounded frame; the corpus-sized work
  * stays inside the upstream scorers, which keep their own scale
  * shapes.
  */
object Ranking {

  /** Fuse candidate lists `(name, df(idCol, scoreCol))` by RRF.
    *
    * Each list is ranked by `(score DESC, id ASC)` — a total order, so
    * ranks are deterministic under ties — then full-outer-joined on the
    * id and folded into `r6(Σ 1/(k + rank))`. Per-list ranks are kept
    * in the output (`rank_<name>`, NULL where absent) so the fused
    * order is auditable. Output: top `topK` by `(rrf DESC, id ASC)`.
    *
    * Determinism: ranks are exact integers; each reciprocal and the
    * 2-3 term sum is the identical IEEE expression tree in any engine;
    * one final r6.
    */
  def rrfFuse(
      lists: Seq[(String, DataFrame)],
      idCol: String,
      scoreCol: String = "score",
      k: Int = 60,
      topK: Int = 20): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one candidate list")
    val ranked = lists.map { case (name, df) =>
      val w = Window.orderBy(col(scoreCol).desc, col(idCol))
      df.select(col(idCol), col(scoreCol))
        .withColumn(s"rank_$name", row_number().over(w).cast("long"))
        .drop(scoreCol)
    }
    val joined = ranked.reduce { (a, b) =>
      a.join(b, Seq(idCol), "full_outer")
    }
    val rrf = lists.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k) + col(s"rank_$name")), lit(0.0))
    }.reduce(_ + _)
    joined
      .withColumn("rrf", r6(rrf))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }

  /** Offline ranking-quality readout: NDCG@k and MRR per query over a
    * ranked candidate frame `(qid, rank, rel)` — rank 1-based and
    * unique within qid, rel a small non-negative integer grade. The
    * standard burnside gains: `DCG = Σ_{rank≤k} (2^rel − 1)/log2(rank+1)`,
    * IDCG the same sum with gains re-ranked by rel descending (ties by
    * original rank — a total order, so the ideal permutation is
    * deterministic), `NDCG = DCG/IDCG` (0 when the query has no
    * relevant candidate), `MRR = 1/min(rank | rel > 0)` (0 likewise).
    *
    * Scale shape: the input is the top-k frame the retrieval stage
    * already produces (bounded per query, like [[rrfFuse]]); both
    * windows partition by qid over ≤ k rows, and everything else is a
    * key-local aggregate. Determinism: gains and ranks are exact
    * integers; each term is the identical IEEE tree (`ln` both
    * engines), r6 at the term level, decimal sums, one final division.
    */
  def rankEval(
      ranked: DataFrame,
      qidCol: String,
      rankCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "rankEval needs k >= 1")
    val inK = ranked.filter(col(rankCol) <= k)
      .select(col(qidCol).as("qid"),
        col(rankCol).cast("long").as("rank"),
        col(relCol).cast("long").as("rel"))
    val gain = pow(lit(2.0), col("rel")) - lit(1.0)
    val ideal = Window.partitionBy("qid")
      .orderBy(col("rel").desc, col("rank"))
    val terms = inK
      .withColumn("irank", row_number().over(ideal).cast("long"))
      .select(col("qid"), col("rel"), col("rank"),
        r6(gain / (log(col("rank") + lit(1.0)) / log(lit(2.0))))
          .as("_t"),
        r6(gain / (log(col("irank") + lit(1.0)) / log(lit(2.0))))
          .as("_it"))
    terms.groupBy("qid")
      .agg(
        count(lit(1)).as("n_ranked"),
        sum((col("rel") > 0).cast("long")).as("n_rel"),
        sum(col("_t").cast("decimal(25,6)")).cast("double").as("_dcg"),
        sum(col("_it").cast("decimal(25,6)")).cast("double").as("_idcg"),
        min(when(col("rel") > 0, col("rank"))).as("_fr"))
      .select(
        col("qid"), col("n_ranked"), col("n_rel"),
        r6(col("_dcg")).as("dcg"),
        when(col("_idcg") > 0, r6(col("_dcg") / col("_idcg")))
          .otherwise(lit(0.0)).as("ndcg"),
        when(col("_fr").isNotNull, r6(lit(1.0) / col("_fr")))
          .otherwise(lit(0.0)).as("mrr"))
  }

  /** DuckDB spelling of [[rankEval]] over a `(qid, rank, rel)`
    * subquery. Emits the same columns; no ORDER BY (caller appends).
    */
  def rankEvalOracleSql(rankedSql: String, k: Int): String = {
    val r6 = graft.queries.Oracle.r6 _
    s"WITH rk AS (SELECT qid, rank::BIGINT AS rank, rel::BIGINT AS rel " +
      s"FROM ($rankedSql) WHERE rank <= $k), " +
      "t AS (SELECT qid, rel, rank, " +
      "row_number() OVER (PARTITION BY qid ORDER BY rel DESC, rank ASC) " +
      "AS irank FROM rk), " +
      "g AS (SELECT qid, rel, rank, " +
      r6("(pow(2.0, rel) - 1.0) / (ln(rank + 1.0) / ln(2.0))") + " AS t, " +
      r6("(pow(2.0, rel) - 1.0) / (ln(irank + 1.0) / ln(2.0))") + " AS it " +
      "FROM t), " +
      "a AS (SELECT qid, count(*)::BIGINT AS n_ranked, " +
      "CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel, " +
      "CAST(CAST(sum(CAST(t AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS dcg0, " +
      "CAST(CAST(sum(CAST(it AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE) AS idcg0, " +
      "min(CASE WHEN rel > 0 THEN rank END) AS fr FROM g GROUP BY qid) " +
      "SELECT qid, n_ranked, n_rel, " + r6("dcg0") + " AS dcg, " +
      "CASE WHEN idcg0 > 0 THEN " + r6("dcg0 / idcg0") +
      " ELSE 0.0 END AS ndcg, " +
      "CASE WHEN fr IS NOT NULL THEN " + r6("1.0 / fr") +
      " ELSE 0.0 END AS mrr FROM a"
  }
}
