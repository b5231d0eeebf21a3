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
}
