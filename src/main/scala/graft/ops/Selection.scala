package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.Det.r6

/** Data-selection operators for assembling an LLM training corpus from
  * a large raw pool: importance resampling toward a target distribution
  * (DSIR, Xie et al. 2023), perplexity-band filtering (CCNet, Wenzek et
  * al. 2020), and temperature-scaled source mixing (the multilingual
  * `p_s ∝ mass_s^α` rule of mBERT/XLM-R). The reference has no
  * counterpart (SURVEY.md §2.8 — absent); these extend the corpus
  * family ([[Corpus]]) with the SELECTION step that decides which
  * documents train at all.
  *
  * Everything is hash- or arithmetic-deterministic (no RNG, no model
  * weights): resampling scores are hashed-n-gram likelihood ratios,
  * perplexity is the bigram-LM surprisal ([[TextPrep.bigramSurprisal]]),
  * and admission decisions reuse the md5-bucket machinery — so every
  * operator is reproducible across runs/engines/partitionings and
  * DuckDB-hash-checkable end to end (SURVEY.md §5.3 discipline).
  */
object Selection {

  /** DSIR importance scores: rank raw-pool documents by how much they
    * resemble a target corpus, using hashed unigram bag-of-words models
    * — the published Data Selection with Importance Resampling recipe
    * with the feature space bucketed to `buckets` dimensions so the
    * model is a fixed-size table, not an unbounded vocabulary.
    *
    * Per bucket b: λ(b) = ln p_target(b) − ln p_raw(b), add-one
    * smoothed over (token count + buckets). Per raw document: score =
    * Σ_tokens λ(bucket(token)) — the log likelihood ratio that DSIR
    * samples by; here exposed exactly (callers select top-k or
    * threshold).
    *
    * Scale shape: ONE occurrence-level aggregate — tokens group to
    * (doc, bucket) counts, which both the global model (second, tiny
    * aggregate over ≤ `buckets` keys) and the per-doc score (join to
    * the broadcast-size λ table, one doc-keyed aggregate) derive from.
    * The token stream crosses the wire once; the model never exceeds
    * `buckets` rows regardless of corpus size.
    *
    * Determinism: bucket = md5 ([[Corpus.hashBucket]] on the token);
    * each ln term is 6-dp-rounded ([[r6]]) before the difference, and
    * per-doc summation is exact decimal × count — the
    * [[TextPrep.bigramSurprisal]] discipline, so scores hash-match
    * DuckDB bit for bit.
    *
    * Output: one row per raw-pool (non-target) document —
    * (`idCol`, n_tokens, score).
    */
  def dsirScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 4096,
      salt: String = "dsir"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val occ = df.select(col(idCol), isTarget.as("_tgt"), explode(toks).as("_tok"))
      .withColumn("_b", Corpus.hashBucket(col("_tok"), salt, buckets))
    // the one occurrence-level aggregate; model and scores both reuse it
    val docBuckets = occ.groupBy(col(idCol), col("_tgt"), col("_b"))
      .agg(count(lit(1)).as("_n"))
    val model = docBuckets.groupBy("_b").agg(
      sum(when(col("_tgt"), col("_n")).otherwise(0L)).as("_ct"),
      sum(when(!col("_tgt"), col("_n")).otherwise(0L)).as("_cr"))
    val totals = model.agg(sum("_ct").as("_nt"), sum("_cr").as("_nr"))
    val lam = model.crossJoin(broadcast(totals))
      .select(col("_b"),
        (r6(log((col("_ct") + lit(1.0)) / (col("_nt") + lit(buckets.toDouble)))) -
          r6(log((col("_cr") + lit(1.0)) / (col("_nr") + lit(buckets.toDouble)))))
          .as("_lam"))
    docBuckets.filter(!col("_tgt"))
      .join(lam, "_b")
      .groupBy(idCol)
      .agg(
        sum(col("_n")).as("n_tokens"),
        // decimal λ × exact count ≡ summing λ once per occurrence
        r6(sum(col("_lam").cast("decimal(25,6)") * col("_n")).cast("double"))
          .as("score"))
  }

  /** Top-`k` DSIR selection: the raw-pool documents most resembling the
    * target, highest score first (id ascending on ties — scores are
    * 6-dp-rounded so cross-engine ties are real ties). Plans as
    * TakeOrdered (per-partition heaps), never a global sort.
    */
  def dsirSelect(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      k: Int,
      buckets: Int = 4096,
      salt: String = "dsir"): DataFrame =
    dsirScores(df, idCol, textCol, isTarget, buckets, salt)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** CCNet-style perplexity banding: score every document with the
    * corpus bigram-LM surprisal, cut the score distribution into
    * head/middle/tail bands, and keep head+middle — the published
    * heuristic that low-perplexity text (under an LM trained on a clean
    * corpus) is higher quality, with the tail dropped as noise.
    *
    * `cuts = Some((t1, t2))` is the production path: band thresholds
    * come from a held-out calibration sample (as CCNet does per
    * language), making this a pure narrow map over the scored frame —
    * no global ordering anywhere. `cuts = None` derives tertile
    * thresholds from the corpus itself via `percentile_disc` over the
    * per-DOCUMENT score frame — a 1-row-per-doc aggregate, ~3 orders
    * smaller than the token stream, so the per-group sort inside
    * percentile_disc is bounded by doc count, not corpus bytes (and at
    * 100 TB you use the calibration-sample path anyway).
    *
    * Output: (`idCol`, n_bigrams, mean_surprisal, band, keep) — band ∈
    * head/middle/tail, keep = 1 unless tail.
    */
  def perplexityBands(
      df: DataFrame,
      idCol: String,
      textCol: String,
      cuts: Option[(Double, Double)] = None): DataFrame = {
    val scored = TextPrep.bigramSurprisal(df, idCol, textCol)
    val withCuts = cuts match {
      case Some((t1, t2)) =>
        scored.withColumn("_t1", lit(t1)).withColumn("_t2", lit(t2))
      case None =>
        // exact discrete tertiles: actual data values, engine-stable
        // (the q_percentile discipline); mean_surprisal is r6-rounded so
        // threshold comparisons see identical doubles on both engines
        val cutsDf = scored.agg(
          expr("percentile_disc(0.333333) WITHIN GROUP (ORDER BY mean_surprisal)")
            .as("_t1"),
          expr("percentile_disc(0.666667) WITHIN GROUP (ORDER BY mean_surprisal)")
            .as("_t2"))
        scored.crossJoin(broadcast(cutsDf))
    }
    withCuts
      .withColumn("band",
        when(col("mean_surprisal") <= col("_t1"), "head")
          .when(col("mean_surprisal") <= col("_t2"), "middle")
          .otherwise("tail"))
      .withColumn("keep", (col("band") =!= "tail").cast("int"))
      .select(col(idCol), col("n_bigrams"), col("mean_surprisal"),
        col("band"), col("keep"))
  }

  /** Temperature-scaled source mixing: sample each source at a rate
    * making the selected corpus follow `p_s ∝ mass_s^α` — the
    * multilingual upweighting rule (α=1 keeps the natural skew, α=0 is
    * uniform over sources; α∈(0,1) lifts the tail). `targetDocs` sets
    * the expected selected-corpus size; per-source admission is the
    * md5-bucket filter, so the draw is exact-reproducible under any
    * partitioning.
    *
    * Scale shape: one tiny per-source aggregate (≤ source count rows)
    * builds the rate table; docs join it broadcast and filter narrowly
    * — the stratifiedSample plan with computed, rather than literal,
    * rates. Rates cap at 1.0 (a source smaller than its allocation
    * contributes everything; the published alternative — epochs > 1 —
    * is [[Corpus.mix]]).
    *
    * Determinism: mass^α routes through `sqrt` chains where exactly
    * expressible (α = 0.5/0.25 — sqrt is correctly rounded per IEEE 754
    * on every engine; `pow` is NOT and would drift cross-engine), and
    * through `pow` otherwise (then only spec-tested, not gate-checked);
    * each weight is r6-rounded before the exact decimal normalization
    * sum; the admission threshold is `floor(rate × buckets)` — floor,
    * not cast, because Spark truncates double→long where DuckDB rounds.
    *
    * Output: per-source audit — (source, n_docs, mass, rate, n_kept,
    * kept_ids checksum) — the frame a corpus builder signs off on
    * before materializing the mixture.
    */
  def temperatureMix(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      massCol: String,
      targetDocs: Long,
      alpha: Double = 0.5,
      salt: String = "tmix",
      buckets: Int = 10000): DataFrame = {
    val mass = col("_mass").cast("double")
    val powered = alpha match {
      case 1.0 => mass
      case 0.5 => sqrt(mass)
      case 0.25 => sqrt(sqrt(mass))
      case a => pow(mass, a) // libm pow: spec-only territory, see scaladoc
    }
    val stats = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("_n"), sum(col(massCol).cast("long")).as("_mass"))
      .withColumn("_w", r6(powered))
    val wsum = stats.agg(
      sum(col("_w").cast("decimal(25,6)")).cast("double").as("_wsum"))
    val rates = stats.crossJoin(broadcast(wsum))
      .withColumn("_p", r6(col("_w") / col("_wsum")))
      .withColumn("rate",
        r6(least(lit(1.0), lit(targetDocs.toDouble) * col("_p") / col("_n"))))
      .select(col(sourceCol), col("_n"), col("_mass"), col("rate"),
        floor(col("rate") * buckets).cast("long").as("_thr"))
    df.select(col(sourceCol), col(idCol))
      .join(broadcast(rates), sourceCol)
      .withColumn("_kept",
        (Corpus.hashBucket(col(idCol), salt, buckets) < col("_thr")).cast("int"))
      .groupBy(col(sourceCol))
      .agg(
        first(col("_n")).as("n_docs"),
        first(col("_mass")).as("mass"),
        first(col("rate")).as("rate"),
        sum(col("_kept")).as("n_kept"),
        sum(when(col("_kept") === 1, col(idCol)).otherwise(0L)).as("kept_id_sum"))
  }
}
