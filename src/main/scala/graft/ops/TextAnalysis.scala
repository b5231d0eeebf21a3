package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (SURVEY.md
  * §7.4): tokenization, shingling, quality scoring, language ID,
  * fingerprinting.
  *
  * Everything here is a narrow per-row projection built from codegen'd
  * built-in functions and higher-order lambdas — no UDFs, no shuffle — so
  * the operators scale linearly with input splits at 100 TB and stay
  * inside whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace tokens. The corpus convention is single-space separated,
    * lowercase; callers needing unicode-aware splitting can pass a custom
    * pattern.
    */
  def tokens(text: Column, pattern: String = " "): Column =
    split(text, pattern)

  /** Distinct n-word shingles of the token array — [[ngrams]] with the
    * duplicates removed (set semantics for MinHash/Jaccard).
    */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(ngrams(toks, n))

  /** All n-word grams of the token array, duplicates kept (empty when
    * fewer than `n` tokens — guarded so `sequence` never sees a
    * negative range).
    *
    * `toks` is bound once as a lambda variable via a 1-element array:
    * higher-order lambdas are interpreted and re-evaluate inlined
    * argument expressions on every element access, so referencing e.g.
    * a `split(...)` column directly inside the body would re-split the
    * text per gram per word.
    */
  def ngrams(toks: Column, n: Int): Column =
    element_at(
      transform(array(toks), t =>
        when(
          size(t) >= n,
          transform(
            sequence(lit(0), size(t) - lit(n)),
            j => concat_ws(" ",
              (1 to n).map(i => element_at(t, j + lit(i))): _*)),
        ).otherwise(array().cast("array<string>"))),
      1)

  /** Single-pass run statistics over a SORTED string array: the struct
    * `(best, dup)` where `best` is the count of the most frequent value
    * (= longest equal run) and `dup` the number of elements whose value
    * occurs more than once (= Gopher's duplicated-n-gram numerator).
    *
    * One `aggregate` fold per row, no shuffle — the relational
    * equivalent (explode → groupBy(doc, gram) → groupBy(doc)) shuffles
    * every n-gram occurrence in the corpus twice, which at 100 TB is
    * ~2× corpus bytes of shuffle for a per-document statistic.
    */
  private[ops] def runStats(sortedArr: Column): Column =
    aggregate(
      sortedArr,
      struct(lit("").as("prev"), lit(0).as("run"),
        lit(0).as("best"), lit(0).as("dup")),
      (acc, x) => {
        val same = x === acc("prev")
        val run2 = when(same, acc("run") + 1).otherwise(lit(1))
        // entering a run's 2nd element counts both it and the 1st
        val dup2 = acc("dup") +
          when(same, when(acc("run") === 1, 2).otherwise(1)).otherwise(0)
        struct(x.as("prev"), run2.as("run"),
          greatest(acc("best"), run2).as("best"), dup2.as("dup"))
      })

  /** Gopher-style repetition quality metrics (Rae et al. 2021 §A1.1,
    * re-expressed over whitespace tokens): duplicate-token fraction,
    * top-bigram occurrence fraction, duplicated-trigram occurrence
    * fraction, and a keep flag under fixed thresholds. High values mark
    * boilerplate/spam documents that LLM corpora drop before training.
    *
    * Pure per-row projection (tokens → sorted n-grams → one fold), so
    * it runs map-side at corpus scale. Every fraction is a single IEEE
    * division of two exact integers, so DuckDB reproduces each value —
    * and the keep flag's comparisons — bit-exactly with no rounding.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toksCol = tokens(col(textCol))
    def frac(num: Column, den: Column): Column =
      when(den > 0, num / den).otherwise(lit(0.0))
    df.withColumn("_toks", toksCol)
      .withColumn("_bg", runStats(array_sort(ngrams(col("_toks"), 2))))
      .withColumn("_tg", runStats(array_sort(ngrams(col("_toks"), 3))))
      .select(
        col(idCol),
        size(col("_toks")).as("n_tokens"),
        frac(size(col("_toks")) - size(array_distinct(col("_toks"))),
          size(col("_toks"))).as("dup_token_frac"),
        frac(col("_bg")("best"), size(col("_toks")) - 1).as("top_bigram_frac"),
        frac(col("_tg")("dup"), size(col("_toks")) - 2).as("dup_trigram_frac"),
      )
      .withColumn("keep",
        (col("dup_token_frac") < 0.6 &&
          col("top_bigram_frac") < 0.08 &&
          col("dup_trigram_frac") < 0.05).cast("int"))
  }

  /** Default stopword list used by the quality/langid heuristics. */
  val EnStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")

  /** Count of tokens contained in `words`. */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, x => x.isInCollection(words)))

  /** BPE-ish token count: alpha runs, digit runs, and single symbols —
    * the standard cheap proxy for subword token counts.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Ratio of non-alphanumeric/space characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[a-z0-9 ]", ""))) / length(text)

  /** Mean token length via an exact integer fold (deterministic). */
  def avgTokenLen(toks: Column): Column =
    aggregate(transform(toks, x => length(x)), lit(0), (a, x) => a + x) /
      size(toks)

  /** Stopword-hit ratio, a standard fluency proxy. */
  def stopwordRatio(toks: Column, words: Seq[String] = EnStopwords): Column =
    hitCount(toks, words) / size(toks)

  /** n-gram-heuristic language ID: score each language by marker-word
    * hits, predict the argmax (ties resolve in declaration order).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
  )

  def langHits(toks: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, ws) => lang -> hitCount(toks, ws) }

  def langPredict(hits: Seq[(String, Column)]): Column =
    // argmax with first-wins ties: lang_i wins if hits_i >= hits_j ∀ j>i
    hits.zipWithIndex.foldRight(lit(hits.last._1)) {
      case (((lang, c), i), rest) =>
        val later = hits.drop(i + 1).map(_._2)
        if (later.isEmpty) lit(lang)
        else when(later.foldLeft(lit(true))((acc, o) => acc && c >= o), lang)
          .otherwise(rest)
    }

  /** Composite quality score in [0,1]: length saturation × (1 − punct
    * noise) × stopword fluency. Deterministic double arithmetic.
    */
  def qualityScore(text: Column, toks: Column): Column =
    least(lit(1.0), size(toks) / lit(100.0)) *
      (lit(1.0) - punctRatio(text)) *
      (lit(0.5) + lit(0.5) * stopwordRatio(toks))

  /** Relational TF-IDF: term frequency per (doc, token), document
    * frequency per token, smoothed idf `ln((N+1)/(df+1)) + 1`
    * (scikit-learn's convention).
    *
    * Two shuffles, both on uniform keys: the (doc, token) group-by and
    * the token-keyed df join — each bounded by vocabulary × docs-present,
    * never corpus bytes. At 100 TB the df table is a broadcastable side
    * input once vocabulary is capped (top-k by df); the full-join form
    * here is the general case.
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = toks.groupBy(idCol, "token").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("token")
      .agg(countDistinct(col(idCol)).as("df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.join(docFreq, "token")
      .crossJoin(broadcast(nDocs)) // lazy scalar: no driver-side action
      .withColumn("idf", log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0)
      .withColumn("tfidf", col("tf") * col("idf"))
      .drop("n_docs")
  }

  /** Heavy hitters by sketch-then-verify: a merged Misra–Gries summary
    * ([[graft.functions.MisraGries]]) nominates candidate tokens with a
    * corpus-size-independent shuffle (capacity-bounded partial summaries
    * instead of every distinct token), then a second pass recounts ONLY
    * the candidates exactly — same pattern as LSH-then-Jaccard dedup:
    * the sketch bounds the work, the verify pass makes the output exact.
    *
    * The candidate set (≤ capacity rows) broadcasts into a semi-join, so
    * the recount's group-by shuffles candidate tokens only — at 100 TB
    * that is k-ish keys instead of a billions-key vocabulary shuffle.
    * Output: (token, freq) top-k over the candidates, freqs exact,
    * ordered freq desc / token asc.
    *
    * Exactness domain — the sketch's support bound, found the hard way
    * at the 10× sweep (SCALE.md §10h): the top-k EQUALS the exact
    * full-vocabulary top-k whenever the k-th true frequency clears
    * N/(capacity+1) — Misra–Gries' retention guarantee. On Zipf-shaped
    * corpora that holds at every scale with a constant capacity (the
    * head grows with N); a corpus whose vocabulary grows while head
    * frequencies stay flat (ScaleUp's disjoint-vocab replicas are the
    * adversarial case) needs capacity ≥ N/f_k or the sketch may evict
    * a true member below the bound — size the knob by that ratio. The
    * always-exact full-aggregate twin is the q_top_tokens path.
    *
    * That domain is a machine-checked CONTRACT, not prose (r11,
    * VERDICT r10 task 7): each output row carries
    * `support_guaranteed = freq·(capacity+1) ≥ N` — exact integer
    * arithmetic, no division. A row with `true` is provably retained
    * by ANY Misra–Gries summary of the stream; if the k-th row reads
    * `true`, the whole top-k equals the exact full-vocabulary top-k.
    * A `false` row is outside the sketch's guarantee — present here
    * because the recount found it, but a capacity bump is the fix if
    * the corpus is flat-headed. N rides the SAME aggregation pass as
    * the sketch (one extra count column), so the op stays two passes
    * over the token stream; the 1-row (sketch, N) frame is eagerly
    * checkpointed — both consumers read the materialized row instead
    * of re-running the pass.
    */
  def heavyHitters(
      df: DataFrame,
      textCol: String,
      k: Int = 20,
      capacity: Int = 256): DataFrame = {
    val toks = df.select(explode(tokens(col(textCol))).as("token"))
    val mg = udaf(new graft.functions.MisraGries(capacity))
    val sk = graft.util.Lineage.checkpoint(
      toks.agg(mg(col("token")).as("cands"),
        count(lit(1)).as("_n_tokens"))).df
    val cands = sk.select(explode(col("cands")).as("token"))
    toks.join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(sk.select(col("_n_tokens"))))
      .withColumn("support_guaranteed",
        col("freq") * lit(capacity + 1) >= col("_n_tokens"))
      .drop("_n_tokens")
      .orderBy(col("freq").desc, col("token")).limit(k)
  }

  /** Deterministic hashing-trick document embedding — the bridge from
    * the text corpus to the similarity/ANN family without an external
    * model: each token hashes to a bucket in [0, dim) with a ±1 sign
    * (both from md5, seed-free), per-bucket signs sum exactly (ints),
    * and the dense vector is L2-normalized. The signed-sum construction
    * is the classic feature-hashing inner-product-preserving sketch
    * (Weinberger et al. 2009), so cosine over these vectors
    * approximates token-multiset similarity.
    *
    * Scale shape: explode → one hash-partitioned (doc, bucket) sum →
    * one (doc) re-assembly group-by, both uniform keys; the densify
    * grid is a per-doc sequence literal, not a join. Determinism:
    * integer sums, one sqrt, one division per component — every engine
    * reproduces the vector bit-for-bit.
    */
  def hashEmbedding(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64): DataFrame = {
    val h = conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long")
    val sign = when(conv(substring(md5(col("token")), 9, 1), 16, 10)
      .cast("int") < 8, 1).otherwise(-1)
    val sums = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .select(col(idCol), (h % dim).cast("int").as("bucket"), sign.as("sign"))
      .groupBy(idCol, "bucket").agg(sum("sign").as("v"))
    // densify against the doc's own [0, dim) grid (array literal, no
    // join), then fold the sparse sums in. distinct() matches the
    // oracle's DISTINCT doc_id — a duplicated id must not double the
    // grid and assemble a 2×dim vector
    val dense = df.select(col(idCol)).distinct()
      .select(col(idCol), explode(sequence(lit(0), lit(dim - 1))).as("bucket"))
      .join(sums, Seq(idCol, "bucket"), "left")
      .withColumn("v", coalesce(col("v"), lit(0L)))
    dense
      .groupBy(idCol)
      .agg(transform(array_sort(collect_list(struct(col("bucket"), col("v")))),
        s => s("v")).as("_vec"))
      .withColumn("_norm",
        sqrt(aggregate(transform(col("_vec"), x => (x * x).cast("double")),
          lit(0.0), _ + _)))
      .withColumn("embedding",
        transform(col("_vec"),
          x => when(col("_norm") > 0, x.cast("double") / col("_norm"))
            .otherwise(lit(0.0))))
      .select(col(idCol), col("embedding"))
  }

  /** Sketch-based corpus profile: HyperLogLog++ approximate distincts
    * next to their exact twins. At 100 TB exact count-distinct shuffles
    * every distinct value; the sketch shuffles fixed-size registers per
    * partition (mergeable, so partial aggregation applies) — the only
    * viable cardinality path at corpus scale. rsd 0.02 ⇒ ~±2% error,
    * asserted in the spec.
    */
  def vocabProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    toks.agg(
      countDistinct("token").as("vocab_exact"),
      approx_count_distinct("token", rsd = 0.02).as("vocab_approx"),
      countDistinct(col(idCol)).as("docs_exact"),
      approx_count_distinct(col(idCol), rsd = 0.02).as("docs_approx"),
      count(lit(1)).as("n_tokens"),
    )
  }

  /** Document fingerprints: full-content md5, winnowed min-shingle md5
    * (stable under small edits elsewhere in the doc), and an 8-char
    * prefix for cheap bucketing.
    */
  def fingerprints(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val sh = shingles(tokens(t), 3)
    df.withColumn("fp_full", md5(t))
      .withColumn("fp_min", array_min(transform(sh, s => md5(s))))
      .withColumn("fp_head", substring(md5(t), 1, 8))
  }

  /** BM25 ranking of documents against a fixed query-term set — the
    * text-retrieval scorer (Robertson–Spärck Jones):
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf = ln(1 + (N−df+0.5)/(df+0.5))`. Top-k docs by score.
    *
    * Scale shape: the query terms are a LITERAL broadcast filter on the
    * exploded token stream, so the (doc, term) tf aggregate touches
    * only matching occurrences; document lengths are a narrow per-row
    * `size`; df and the avgdl/N scalars are tiny broadcasts. Per-term
    * scores are r6-rounded before the decimal sum (the ln discipline),
    * making the ranking hash-stable cross-engine.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    import graft.queries.Det.r6
    val toks = df.select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("t"))
    val qtoks = toks.filter(col("t").isin(terms: _*))
    val tf = qtoks.groupBy("_id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df_t"))
    val dl = df.select(col(idCol).as("_id"),
      size(tokens(col(textCol))).cast("double").as("dl"))
    val stats = dl.agg(
      count(lit(1)).as("_N"),
      (sum(col("dl").cast("decimal(25,6)")).cast("double") / count(lit(1)))
        .as("_avgdl"))
    val idf = log(lit(1.0) +
      (col("_N") - col("df_t") + lit(0.5)) / (col("df_t") + lit(0.5)))
    val norm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("_avgdl")))
    tf
      .join(broadcast(dfreq), "t")
      .join(dl, "_id")
      .crossJoin(broadcast(stats))
      .withColumn("_s", r6(idf * norm))
      .groupBy(col("_id").as(idCol))
      .agg(r6(sum(col("_s").cast("decimal(25,6)")).cast("double")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  /** Per-group Zipf fit: least-squares slope/intercept of
    * ln(count) ~ ln(rank) over each group's `topK` most frequent
    * tokens — the corpus-health check that a source's token
    * distribution follows the expected power law (natural text sits
    * near slope −1; template/boilerplate-heavy or synthetic sources
    * bend away from it).
    *
    * Determinism: ln(rank) and ln(count) are r6-rounded FIRST (one
    * double log per kept token, same contract as TF-IDF's idf), the
    * four OLS moment sums ride DECIMAL(25,6) (order-independent), and
    * the closed-form slope/intercept are single double expressions over
    * those exact sums, r6'd at the end — bit-equal cross-engine.
    *
    * Scale shape: token counts shuffle once on (group, token); the
    * rank window partitions by group, so one reducer holds one group's
    * VOCABULARY (Zipf-bounded, millions of rows — the same per-group
    * bound as the BPE/vocab operators, and orders below corpus size).
    * The moment aggregate is topK × groups rows.
    */
  def zipfFit(
      df: DataFrame,
      groupCol: String,
      textCol: String,
      topK: Int = 50): DataFrame = {
    import graft.queries.Det.r6
    val counts = df
      .select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("grp", "t").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("c").desc, col("t").asc)
    val pts = counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("grp"),
        r6(log(col("rank").cast("double"))).as("x"),
        r6(log(col("c").cast("double"))).as("y"))
    def dsum(c: Column): Column = sum(c.cast("decimal(25,6)")).cast("double")
    pts.groupBy("grp")
      .agg(
        count(lit(1)).as("k"),
        dsum(col("x")).as("_sx"),
        dsum(col("y")).as("_sy"),
        dsum(r6(col("x") * col("y"))).as("_sxy"),
        dsum(r6(col("x") * col("x"))).as("_sxx"))
      .select(col("grp").as(groupCol), col("k"),
        r6((col("k") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("k") * col("_sxx") - col("_sx") * col("_sx"))).as("slope"),
        r6((col("_sy") - (col("k") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("k") * col("_sxx") - col("_sx") * col("_sx")) * col("_sx")) /
          col("k")).as("intercept"))
  }

  /** Corpus-level PMI collocations: the `topK` adjacent-bigram pairs by
    * pointwise mutual information `ln(p(a,b) / (p(a)·p(b)))` among
    * bigrams occurring at least `minCount` times. PMI is the classic
    * collocation / phrase-mining score (word2vec's phrase pass, NPMI
    * phrase detectors): high-PMI pairs are multi-word units a tokenizer
    * or n-gram vocabulary should treat as one symbol.
    *
    * Determinism: all counts are exact integers off two aggregates of
    * the same token stream; the single `ln` per surviving pair is
    * r6-rounded, and the top-K order is (pmi DESC, w1, w2) — total, so
    * the cut is cross-engine exact.
    *
    * Scale shape: one corpus-sized explode feeding two hash aggregates
    * (bigram counts, unigram counts), then two vocabulary-keyed joins
    * on the BIGRAM-DISTINCT table (vocab², bounded far below corpus
    * size; the `minCount` filter prunes before the join), two 1-row
    * broadcast totals, and a topK sort over surviving pairs. Nothing is
    * ever corpus × vocab.
    */
  def pmiBigrams(
      df: DataFrame,
      textCol: String,
      minCount: Long = 5,
      topK: Int = 50): DataFrame = {
    import graft.queries.Det.r6
    val toks = df.select(tokens(col(textCol)).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
    val uc = uni.groupBy("w").agg(count(lit(1)).as("c_w"))
    val ut = uni.agg(count(lit(1)).as("n_uni"))
    val n = size(col("t"))
    val big = toks
      .select(explode(zip_with(
        slice(col("t"), lit(1), n - lit(1)),
        slice(col("t"), lit(2), n - lit(1)),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("z"))
      .select(col("z.w1"), col("z.w2"))
    val bc = big.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val bt = big.agg(count(lit(1)).as("n_bi"))
    bc.filter(col("c_ab") >= minCount)
      .join(uc.select(col("w").as("w1"), col("c_w").as("c_a")), "w1")
      .join(uc.select(col("w").as("w2"), col("c_w").as("c_b")), "w2")
      .crossJoin(broadcast(ut))
      .crossJoin(broadcast(bt))
      .select(col("w1"), col("w2"), col("c_ab"),
        r6(log((col("c_ab").cast("double") / col("n_bi")) /
          ((col("c_a").cast("double") / col("n_uni")) *
            (col("c_b").cast("double") / col("n_uni"))))).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Per-document unigram entropy and type–token ratio — the vocabulary
    * -diversity quality signals: near-zero entropy means a document is
    * one token repeated (boilerplate, padding), entropy ≈ ln(n_types)
    * means every token is distinct. Quality filters band on these the
    * same way they band on the repetition ratios.
    *
    * Determinism: counts are exact; each `−p·ln p` term is r6-rounded
    * before the decimal sum (the [[TextPrep.bigramSurprisal]]
    * discipline), so cross-engine log ulps cannot accumulate.
    *
    * Scale shape: explode → (doc, word) hash aggregate → per-doc
    * re-aggregate; the join back is on the doc key the aggregate just
    * produced. Linear in corpus tokens, output one row per document.
    */
  def unigramEntropy(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    import graft.queries.Det.r6
    val wc = df
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("c"))
    val dn = wc.groupBy(idCol)
      .agg(sum("c").as("n"), count(lit(1)).as("d"))
    val p = col("c").cast("double") / col("n")
    wc.join(dn, idCol)
      .withColumn("_h", r6(-p * log(p)))
      .groupBy(idCol)
      .agg(
        max(col("n")).as("n_tokens"),
        max(col("d")).as("n_types"),
        r6(max(col("d")).cast("double") / max(col("n"))).as("ttr"),
        r6(sum(col("_h").cast("decimal(25,6)")).cast("double")).as("entropy"))
  }

  /** Per-token syllable estimate: contiguous vowel groups (the standard
    * dictionary-free heuristic), floored at 1 so consonant-only tokens
    * still count one. Both engines spell it as
    * `greatest(len(regexp_extract_all(tok, '[aeiouy]+')), 1)`.
    */
  def syllables(tok: Column): Column =
    greatest(size(regexp_extract_all(tok, lit("[aeiouy]+"), lit(0))), lit(1))
      .cast("long")

  /** Per-document readability metrics — Flesch reading ease and
    * Flesch–Kincaid grade from word, sentence, and heuristic syllable
    * counts. A complexity-based quality signal orthogonal to
    * [[qualityScore]]'s ratio features and [[unigramEntropy]]'s
    * vocabulary diversity: training-data curricula and audience filters
    * key on exactly these scores. Sentences are terminator runs
    * ([.!?]+) floored at 1, so unpunctuated text degrades to the
    * one-sentence convention rather than dividing by zero.
    *
    * Scale shape: explode to (doc, token), one hash aggregate back to
    * doc granularity — linear in corpus tokens, no join, no window.
    * Determinism: counts are exact integers; each score is double
    * arithmetic off integer ratios spelled as one identical tree both
    * engines, then r6.
    */
  def readability(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    import graft.queries.Det.r6
    val sentences = greatest(
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")
    val perTok = df
      .select(col(idCol), sentences.as("_s"),
        explode(tokens(col(textCol))).as("_w"))
      .filter(length(col("_w")) > 0)
    val agg = perTok
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_words"),
        max(col("_s")).as("n_sentences"),
        sum(syllables(col("_w"))).as("n_syllables"))
    val wps = col("n_words").cast("double") / col("n_sentences")
    val spw = col("n_syllables").cast("double") / col("n_words")
    agg.select(
      col(idCol), col("n_words"), col("n_sentences"), col("n_syllables"),
      r6(lit(206.835) - lit(1.015) * wps - lit(84.6) * spw)
        .as("flesch_ease"),
      r6(lit(0.39) * wps + lit(11.8) * spw - lit(15.59))
        .as("fk_grade"))
  }

  /** Corpus-level adjacency co-occurrence edges for TextRank: adjacent
    * token pairs (window 2, the Mihalcea & Tarau default), tokens
    * shorter than `minLen` dropped (the cheap deterministic stand-in
    * for a POS filter), self-pairs dropped, canonicalized u < v, weight
    * = corpus-wide co-occurrence count with `w ≥ minCount` pruning the
    * long tail BEFORE the graph is built — at 100 TB the prune is what
    * keeps the vertex set at vocabulary scale rather than typo scale.
    * One narrow explode + one hash aggregate; no joins.
    */
  def textRankEdges(
      df: DataFrame,
      textCol: String,
      minLen: Int = 4,
      minCount: Int = 2): DataFrame = {
    val t = tokens(col(textCol))
    val pairs = transform(sequence(lit(1), size(t) - 1), k =>
      struct(element_at(t, k).as("a"), element_at(t, k + 1).as("b")))
    df.filter(size(t) >= 2)
      .select(explode(pairs).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(length(col("a")) >= minLen && length(col("b")) >= minLen &&
        col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minCount)
  }

  /** TextRank keyword extraction: [[textRankEdges]] →
    * [[Graphs.pageRankWeighted]] → top-`topK` tokens by rank. The
    * rank-on-a-word-graph keyword scorer; scores are r6'd ×1000 (the
    * q_pagerank convention).
    */
  def textRankKeywords(
      df: DataFrame,
      textCol: String,
      minLen: Int = 4,
      minCount: Int = 2,
      damping: Double = 0.85,
      iters: Int = 3,
      topK: Int = 30): DataFrame = {
    import graft.queries.Det.r6
    Graphs.pageRankWeighted(textRankEdges(df, textCol, minLen, minCount),
        damping, iters)
      .select(col("x").as("token"), r6(col("r") * lit(1000.0)).as("rank_k"))
      .orderBy(col("rank_k").desc, col("token"))
      .limit(topK)
  }
}
