package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for a large-scale training-data pipeline:
  * deterministic train/val/test splitting, stratified (per-stratum rate)
  * sampling, epoch-weighted source mixing, sequence packing into
  * fixed-size context windows, and an inverted index over tokens.
  *
  * These extend the reference's surface (SURVEY.md §2.8 — absent there)
  * with the operations a 100 TB corpus build needs. Everything here is
  * **hash-deterministic**, not RNG-based: assignment decisions key off
  * `md5(salt || id)`, so they are (a) reproducible across runs, engines
  * and cluster sizes — no seed-plus-partitioning coupling like
  * `sample()`/`randomSplit()` (SURVEY.md §5.3 exclusions) — and (b)
  * DuckDB-expressible, so the driver gate hash-checks them end to end.
  * At scale every operator is a narrow projection, a single hash
  * aggregation, or one range shuffle; no driver-side loops, no
  * collects.
  */
object Corpus {

  /** Deterministic bucket in `[0, buckets)`: the first 8 hex chars of
    * `md5(salt || id)` as an integer, mod `buckets`. Uniform (md5 on a
    * unique key), stable across engines — DuckDB spells it
    * `('0x' || substr(md5(salt || id::VARCHAR), 1, 8))::BIGINT % buckets`.
    * Codegen'd end to end (md5 / substring / conv are all built-ins).
    */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Deterministic train/val/test split: each row lands in the fraction
    * band its hash bucket falls into. `fractions` are (label, weight)
    * pairs normalized over their sum; assignment is per-row independent
    * (narrow, no shuffle) and reproducible no matter how the data is
    * partitioned — the property `randomSplit` cannot give you on a
    * cluster whose partitioning changed between runs.
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)],
      salt: String = "split",
      buckets: Int = 10000): DataFrame = {
    val total = fractions.map(_._2).sum
    val cums = fractions.scanLeft(0.0)(_ + _._2).tail
    val thresholds = fractions.zip(cums).map { case ((label, _), c) =>
      label -> math.round(c / total * buckets)
    }
    val b = hashBucket(col(idCol), salt, buckets)
    val split = thresholds.init.foldRight(lit(thresholds.last._1)) {
      case ((label, thr), rest) => when(b < thr, label).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** End-to-end corpus curation — the flagship composition proving the
    * operator families fit together as one declarative plan:
    *
    *  1. quality gate: Gopher repetition thresholds
    *     ([[TextAnalysis.repetitionMetrics]] keep flag) AND predicted
    *     language == `lang` ([[TextAnalysis.langPredict]]);
    *  2. exact dedup: one survivor (min id) per word-set key
    *     ([[Dedup.wordSetKey]]);
    *  3. deterministic split assignment ([[hashSplit]]).
    *
    * Scale shape: steps 1 and the key/language derivations are narrow
    * map work fused into the scan; the only shuffles are the survivor
    * group-by on the uniform md5 key and the id-join of the metrics
    * frame (both corpus-bounded, both AQE-coalesced). Output is one row
    * per surviving document with its split — the exact frame a
    * downstream tokenizer/packer consumes.
    */
  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
  ): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val rep = TextAnalysis.repetitionMetrics(df, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("keep"))
    val base = df.select(
      col(idCol),
      TextAnalysis.langPredict(TextAnalysis.langHits(toks)).as("lang_pred"),
      Dedup.wordSetKey(toks).as("_key"))
    val kept = base.join(rep, Seq(idCol))
      .filter(col("keep") === 1 && col("lang_pred") === lang)
    val survivors = kept
      .groupBy("_key")
      .agg(min(struct(col(idCol), col("n_tokens"))).as("_s"))
      .select(col(s"_s.$idCol").as(idCol), col("_s.n_tokens").as("n_tokens"))
    hashSplit(survivors, idCol, fractions)
      .select(col(idCol), col("n_tokens"), col("split"))
  }

  /** Per-stratum deterministic sampling: keep a row iff its hash bucket
    * is under `rate(stratum) * buckets`. The workhorse for rebalancing a
    * corpus (downsample the dominant language, keep the rare ones) —
    * a pure narrow filter that pushes into the scan, with exact,
    * engine-independent selection (contrast `sampleBy`, which is RNG-
    * and partitioning-dependent).
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      salt: String = "strat",
      buckets: Int = 10000): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (rest, (k, r)) =>
      when(col(stratumCol) === k, r).otherwise(rest)
    }
    df.filter(hashBucket(col(idCol), salt, buckets) < (rate * buckets).cast("long"))
  }

  /** Epoch-weighted source mixing: replicate each row `floor(w)` times
    * plus one more with probability `frac(w)`, decided by the row's hash
    * bucket — the standard "2.3 epochs of wiki, 0.5 epochs of web"
    * mixture, made deterministic. Output carries `copy_idx` (0-based) so
    * downstream shuffling/packing can treat copies as distinct rows.
    * `array_repeat` + `posexplode` keeps it a narrow per-row expansion;
    * rows with zero copies drop out (empty array explodes to nothing).
    */
  def mix(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0,
      salt: String = "mix",
      buckets: Int = 10000): DataFrame = {
    val w = weights.foldLeft(lit(defaultWeight)) { case (rest, (k, v)) =>
      when(col(sourceCol) === k, v).otherwise(rest)
    }
    val copies = (floor(w).cast("long") +
      when(hashBucket(col(idCol), salt, buckets) <
        ((w - floor(w)) * buckets).cast("long"), 1L).otherwise(0L))
      .cast("int")
    df.withColumn("_copies", copies)
      .select(col("*"), posexplode(array_repeat(lit(1), col("_copies"))))
      .withColumnRenamed("pos", "copy_idx")
      .drop("col", "_copies")
  }

  /** Sequence packing, concat-and-chunk semantics: documents are laid
    * end to end in `orderCol` order and cut every `capacity` tokens —
    * the packing used by most LLM training pipelines (no padding waste;
    * a document may span two windows). Emits `pack_id` (which window the
    * doc STARTS in) and `begin_offset` (token position inside it), both
    * pure functions of the running token count, so the result is exactly
    * reproducible and oracle-checkable.
    *
    * Scale: the running sum needs a total order — one range shuffle.
    * A 100 TB corpus packs per shard instead: pass `shardCol` to scope
    * the order (and the `pack_id` space) to each shard, which turns the
    * global sort into an embarrassingly parallel per-shard sort — the
    * window becomes `partitionBy(shard).orderBy(order)`, Spark's
    * distributed-window shape (one hash shuffle, per-key sorted spill).
    */
  def packChunked(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      capacity: Int,
      shardCol: Option[String] = None): DataFrame = {
    val w0 = shardCol.map(Window.partitionBy(_)).getOrElse(Window.partitionBy())
    val w = w0.orderBy(orderCol).rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("_cum_before", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("pack_id", expr(s"_cum_before div $capacity"))
      .withColumn("begin_offset", (col("_cum_before") % capacity).cast("int"))
      .drop("_cum_before")
  }

  /** Sequence packing, greedy first-fit semantics: within each range
    * partition, scan docs in `orderCol` order and open a new bin
    * whenever the current doc would overflow `capacity` (docs larger
    * than `capacity` get a bin of their own — callers chunk first if
    * that's unwanted). No doc spans bins; bins never exceed capacity
    * (except those single-oversized-doc bins).
    *
    * Scale shape: `repartitionByRange(orderCol)` + an in-partition
    * sequential scan (`mapPartitions`) — greedy packing is inherently a
    * running fold, so the parallelism unit is the range shard, and bin
    * ids are made globally unique by offsetting with the partition id.
    * Spec-tested (PackingSpec) rather than oracle-checked: first-fit is
    * not expressible as a fixed-depth SQL window.
    */
  def packGreedy(
      df: DataFrame,
      orderCol: String,
      tokensCol: String,
      capacity: Int,
      partitions: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.types._
    val base = df.select(
      col(orderCol).cast("long").as("_id"), col(tokensCol).cast("int").as("_tok"))
    val schema = StructType(Seq(
      StructField("_id", LongType), StructField("_tok", IntegerType),
      StructField("pack_id", LongType), StructField("pack_used", IntegerType)))
    val packed = base
      .repartitionByRange(partitions, col("_id"))
      .sortWithinPartitions("_id")
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var bin = pid << 40 // partition-scoped bin-id space, globally unique
        var used = 0
        var first = true
        rows.map { r =>
          val tok = r.getInt(1)
          if (first) { first = false; used = 0 }
          else if (used + tok > capacity) { bin += 1; used = 0 }
          val out = org.apache.spark.sql.Row(r.getLong(0), tok, bin, used + tok)
          used += tok
          out
        }
      }(org.apache.spark.sql.Encoders.row(schema))
    packed.withColumnRenamed("_id", orderCol).withColumnRenamed("_tok", tokensCol)
  }

  /** Per-stratum document quota: keep the top `cap` rows of each
    * stratum ranked by `scoreCol` descending (id ascending on ties) —
    * the "at most N documents per domain/source" rule every web-crawl
    * curation applies so one mega-site cannot dominate the corpus.
    *
    * Scale shape: the bounded-heap [[graft.functions.TopKAggregator]]
    * pre-reduces every map task's slice to ≤ `cap` entries per stratum
    * before the shuffle, so what crosses the wire is cap-bounded heaps
    * — never the stratum's full row set. The `row_number().over(Window)`
    * spelling ships EVERY row of a hot domain to one reducer and sorts
    * there; at 100 TB a single boilerplate-heavy site breaks that task.
    * Output: (stratum, id, score, rank), rank 1-based in quota order.
    */
  def sourceQuota(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      scoreCol: String,
      cap: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(stratumCol).cast("string"), col(idCol).cast("long"),
        col(scoreCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAggregator(cap).toColumn)
      .flatMap { case (stratum, top) =>
        top.iterator.zipWithIndex.map { case ((id, s), i) =>
          (stratum, id, s, (i + 1).toLong)
        }
      }
      .toDF(stratumCol, idCol, scoreCol, "rank")
  }

  /** Deterministic WEIGHTED exact-size sample — Efraimidis–Spirakis
    * (2006) A-ES with the RNG replaced by the row's hash: each row
    * draws u = (bucket+1)/(buckets+1) ∈ (0,1) from `md5(salt || id)`
    * and the k rows minimizing key = −ln(u)/w are kept, so inclusion
    * probability scales with weight `w` (e.g. quality score, length) —
    * the "sample 1M docs, favoring high quality" corpus op, exactly
    * reproducible across runs, engines, and partitionings.
    *
    * Determinism: one ln per row, 6-dp-rounded BEFORE ranking (the
    * TF-IDF/idf discipline — cross-engine libm ulps cannot flip an
    * order decided on rounded keys), id as the final tiebreak. Plans as
    * TakeOrdered (per-partition heaps), like [[sampleK]].
    *
    * Weight contract: only rows with a strictly positive, non-null
    * weight participate — enforced by filter, since a zero weight makes
    * the key −ln(u)/0 = +Inf (engine-dependent NULL/Inf handling) and a
    * NEGATIVE weight yields a negative key that always wins, both of
    * which silently corrupt the weighted semantics. A-ES assigns
    * weight-0 rows inclusion probability 0 anyway, so the filter IS the
    * algorithm's own semantics, not a data loss.
    */
  def sampleWeighted(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: String = "wsample",
      buckets: Int = 1 << 20): DataFrame = {
    val u = (hashBucket(col(idCol), salt, buckets) + lit(1.0)) / (buckets + 1.0)
    val key = graft.queries.Det.r6(-log(u) / col(weightCol).cast("double"))
    df.filter(col(weightCol).cast("double") > 0.0)
      .withColumn("_wk", key)
      .orderBy(col("_wk"), col(idCol))
      .limit(k)
      .drop("_wk")
  }

  /** Deterministic exact-size sample: the `k` rows with the smallest
    * `md5(salt || id)` — a uniform "random" sample with an exact row
    * count, reproducible across runs/engines/partitionings (neither
    * property holds for `sample()`, whose output size is binomial and
    * seed×partitioning-dependent). Changing `salt` redraws the sample;
    * growing `k` strictly extends it (hash order is fixed), which gives
    * nested samples for scaling-law runs.
    *
    * Plans as TakeOrderedAndProject: per-partition top-k heaps, then a
    * driver merge of k×partitions candidates — no global sort, no full
    * shuffle, valid while k stays driver-sized (it's a sample; it is).
    */
  def sampleK(df: DataFrame, idCol: String, k: Int, salt: String = "samplek"): DataFrame =
    df.withColumn("_h", md5(concat(lit(salt), col(idCol).cast("string"))))
      .orderBy("_h")
      .limit(k)
      .drop("_h")

  /** Deterministic negative sampling for contrastive training: for each
    * anchor row, `k` negatives drawn from a hash-selected global pool,
    * excluding the anchor's own group (same-source texts are too likely
    * to be soft positives), ranked by a per-(anchor, candidate) hash —
    * so every anchor gets its own reproducible draw, identical across
    * runs, engines, and partitionings.
    *
    * Scale shape: per-anchor sampling from the FULL corpus is an
    * anchors × corpus theta join — never viable. The standard fix is a
    * pool: [[sampleK]] draws `poolSize` uniform candidates (exact-size,
    * hash-deterministic), the pool BROADCASTS, and each anchor ranks
    * only pool members (one window partitioned by the anchor key over
    * n × poolSize rows). Pool uniformity means group exclusion costs
    * only the anchor's own group's share of the pool, and a
    * `poolSize ≫ k` leaves the per-anchor draw effectively uniform over
    * other-group docs.
    */
  def negativeSample(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int,
      poolSize: Int = 64,
      salt: String = "negs"): DataFrame = {
    require(k >= 1 && poolSize > k,
      s"need poolSize > k >= 1: k=$k poolSize=$poolSize")
    val pool = sampleK(df.select(col(idCol), col(groupCol)), idCol, poolSize,
        salt + "_pool")
      .select(col(idCol).as("neg_id"), col(groupCol).as("_ng"))
    df.select(col(idCol), col(groupCol))
      .join(broadcast(pool), col(groupCol) =!= col("_ng"))
      .withColumn("_r", md5(concat(lit(salt), col(idCol).cast("string"),
        lit("_"), col("neg_id").cast("string"))))
      .withColumn("neg_rank", row_number().over(
        Window.partitionBy(idCol).orderBy(col("_r"), col("neg_id"))))
      .filter(col("neg_rank") <= k)
      .select(col(idCol), col("neg_id"), col("neg_rank"))
  }

  /** Deterministic token-budget corpus cut: the hash-ordered prefix of
    * the corpus whose RUNNING token total stays within `budget` —
    * "build me a 1B-token corpus" answered exactly and reproducibly
    * (same rows under any partitioning, engine, or cluster size;
    * growing the budget strictly extends the cut, giving nested
    * corpora for scaling-law ladders).
    *
    * Scale shape: a cumulative sum wants ONE global ordering — the
    * single-partition-window anti-pattern. This is the classic
    * distributed prefix sum instead: the leading hash byte buckets the
    * rows (256 buckets whose NUMERIC order equals the hash string
    * order, so bucket-major + intra-bucket-hash order IS the global
    * hash order), per-bucket token totals aggregate to a 256-row frame
    * whose exclusive running offsets broadcast back, and the
    * intra-bucket cumulative sum runs as a window partitioned by
    * bucket — hash-uniform, no skewed reducer, no global sort.
    */
  def tokenBudget(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      salt: String = "budget"): DataFrame = {
    require(budget >= 0, s"budget must be non-negative: $budget")
    val rows = df
      .withColumn("_h", md5(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("_b", conv(substring(col("_h"), 1, 2), 16, 10).cast("int"))
    val offsets = rows.groupBy("_b")
      .agg(sum(col(tokenCol).cast("long")).as("_t"))
      .withColumn("_off",
        coalesce(sum("_t").over(
          Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("_b", "_off")
    rows
      .join(broadcast(offsets), "_b")
      .withColumn("cum_tokens",
        sum(col(tokenCol).cast("long")).over(
          Window.partitionBy("_b").orderBy(col("_h"), col(idCol))) + col("_off"))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(tokenCol), col("cum_tokens"))
  }

  /** Deterministic training-shard assignment — the last mile of a corpus
    * build: dataloaders want the corpus globally shuffled and cut into
    * `nShards` fixed sequential files, reproducibly. One md5 per row
    * drives everything: the hash IS the shuffle order (content-derived,
    * so identical under any partitioning or cluster size), its leading
    * 8 hex chars pick the shard, and `pos` is the row's rank within its
    * shard by the full hash.
    *
    * Scale shape: shard sizes are hash-uniform (Binomial(n, 1/nShards)
    * — tight at any corpus size) WITHOUT a global total order; an exact
    * round-robin over a global rank would need a single-partition
    * window, the canonical 100 TB anti-pattern. The only wide op is one
    * window partitioned by the shards themselves — uniform by
    * construction, so no skewed reducer. The writer pairs this with
    * `partitionBy("shard")` + sort on `pos`.
    */
  def shardForTraining(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      salt: String = "shard"): DataFrame = {
    require(nShards >= 1, s"nShards must be positive: $nShards")
    df.withColumn("_ord", md5(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("shard",
        (conv(substring(col("_ord"), 1, 8), 16, 10).cast("long") % nShards)
          .cast("int"))
      // md5 ties are practically impossible; id tiebreak keeps the
      // contract total anyway
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("_ord"), col(idCol))))
      .drop("_ord")
  }

  /** Benchmark-contamination check: n-gram shingle overlap between a
    * training corpus and an evaluation set — the data-hygiene pass every
    * LLM corpus build runs before training (is the eval set leaking into
    * the training data?). Emits (eval_id, train_id, n_common,
    * n_shingles, overlap) for pairs sharing ≥ `minCommon` shingles,
    * where `overlap` = matched fraction of the eval doc's shingles.
    *
    * Scale shape: both sides shingle narrowly (explode), the match is
    * ONE equi-join on the shingle string — hash-partitioned, never
    * all-pairs. The skew hazard is boilerplate n-grams appearing in
    * millions of training docs; `maxShingleDf` drops shingles whose
    * train-side document frequency exceeds the cap BEFORE the join
    * (an n-gram that common carries no contamination signal — real
    * leaks are rare, near-unique n-grams). The eval side is tiny by
    * nature, so the joined/grouped result stays bounded by
    * eval_docs × matched train docs.
    */
  def contamination(
      train: DataFrame,
      evalDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minCommon: Int = 2,
      maxShingleDf: Long = 10000): DataFrame = {
    val t = Dedup.shingleTable(train, idCol, textCol, n)
      .select(col(idCol).as("train_id"), col("shingle"))
    val hot = t.groupBy("shingle").agg(count(lit(1)).as("_df"))
      .filter(col("_df") > maxShingleDf).select("shingle")
    val tf = t.join(hot, Seq("shingle"), "left_anti")
    val e = Dedup.shingleTable(evalDf, idCol, textCol, n)
      .select(col(idCol).as("eval_id"), col("shingle"))
    val evalTotals = e.groupBy("eval_id").agg(count(lit(1)).as("n_shingles"))
    e.join(tf, "shingle")
      .groupBy("eval_id", "train_id")
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
      .join(evalTotals, "eval_id")
      .withColumn("overlap",
        graft.queries.Det.r6(col("n_common") / col("n_shingles")))
  }

  /** Per-document novelty: the fraction of a doc's distinct n-gram
    * shingles that appear in NO other document — the inverse signal of
    * [[contamination]]. Low novelty means the doc is assembled from
    * n-grams the corpus already has (template/boilerplate/near-dup
    * survivors); data-selection recipes upweight high-novelty docs
    * and memorization audits flag low-novelty ones. Docs with fewer
    * than `n` tokens have no shingles and are excluded (both engines
    * spell the same exclusion).
    *
    * Scale shape: shingle explode → shingle-keyed df aggregate → one
    * equi-join back on the shingle → per-doc re-aggregate. Linear in
    * corpus shingles, the same exchange [[contamination]] uses; no
    * pairwise anything. The df frame is vocabulary-sized (distinct
    * shingles), and the join key is the shingle string — hash-uniform.
    */
  def noveltyScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val sh = Dedup.shingleTable(df, idCol, textCol, n)
    // shingles are per-doc distinct, so count(*) IS document frequency
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("_df"))
    val novel = when(col("_df") === 1, 1L).otherwise(0L)
    sh.join(dfreq, "shingle")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(novel).as("n_novel"),
        graft.queries.Det.r6(
          sum(novel).cast("double") / count(lit(1))).as("novelty"))
  }

  /** Inverted index: token → document frequency + (capped) sorted
    * posting list. Tokens are de-duplicated per document first (df
    * counts documents, not occurrences).
    *
    * The cap is enforced BEFORE collection: a `row_number` over
    * (token, doc_id) marks the first `maxPostings` docs per token and
    * only those enter the `collect_list` — a stopword's posting list
    * never materializes corpus-sized in one aggregation buffer (the
    * naive `slice(collect_list(...))` spelling caps only the OUTPUT,
    * after the buffer already blew up). `df` still reports the exact
    * count via partial counts. The window and the groupBy share the
    * hash partitioning on `token`, so the whole thing is the explode
    * (narrow) plus ONE shuffle; `minDf` floors the Zipf long tail out
    * of the result.
    */
  def invertedIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Int = 2,
      maxPostings: Int = 20): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(array_distinct(split(col(textCol), " "))).as("token"))
      .filter(length(col("token")) > 0)
    val w = Window.partitionBy("token").orderBy("doc_id")
    toks
      .withColumn("_rn", row_number().over(w))
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(when(col("_rn") <= maxPostings, col("doc_id"))))
          .as("postings"))
      .filter(col("df") >= minDf)
  }

  /** Pairwise shingle-set overlap between sources — the "how much do
    * these corpora share" audit run before mixing them (double-counted
    * content inflates a source's effective weight; high overlap between
    * a train source and an eval source is contamination).
    *
    * For every source pair (a < b): |A∩B|, |A|, |B| and the exact
    * Jaccard of their distinct n-gram shingle sets. Pairs with an empty
    * intersection are omitted (their Jaccard is 0; at corpus scale the
    * zero matrix is noise).
    *
    * Scale shape: one distinct over (source, shingle) — shuffle keyed on
    * the shingle text, uniform — then a shingle-keyed self-join whose
    * per-key fanout is bounded by the number of SOURCES carrying that
    *  shingle (≤ S, and the pair explosion ≤ S² per shingle — sources
    * number in the dozens, not millions), then an aggregate over S²
    * keys. The corpus never joins itself at document granularity.
    */
  def sourceOverlap(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val sets = df.select(col(sourceCol).as("src"),
        explode(TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n))
          .as("shingle"))
      .distinct()
    val sizes = sets.groupBy("src").agg(count(lit(1)).as("n_set"))
    val inter = sets.as("x")
      .join(sets.as("y"), col("x.shingle") === col("y.shingle") &&
        col("x.src") < col("y.src"))
      .groupBy(col("x.src").as("src_a"), col("y.src").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("src").as("src_a"), col("n_set").as("n_a")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n_set").as("n_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("n_inter"), col("n_a"), col("n_b"),
        graft.queries.Det.r6(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
  }

  /** The sketch form of [[sourceOverlap]] — the 100 TB path. Per source,
    * a k-hash MinHash signature of its ENTIRE shingle set (min over all
    * shingles of md5(shingle || '#' || i), the same md5 permutation
    * family as the per-doc dedup signatures); the pairwise Jaccard
    * estimate is the fraction of agreeing components.
    *
    * Scale shape vs the exact audit: no (source, shingle) distinct — the
    * min is idempotent, so duplicate shingles need no dedup — and the
    * shuffle carries sources × k partial minima (map-side combined)
    * instead of every distinct shingle string. One corpus scan, a
    * near-zero shuffle, and an S²×k-row comparison at the end.
    * Estimator sd = sqrt(J(1−J)/k) ≤ 0.5/√k (~0.0625 at k=64).
    * md5-deterministic: the estimate itself hash-checks cross-engine.
    */
  def sourceOverlapSketch(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      n: Int = 3,
      numHashes: Int = 64): DataFrame = {
    val sigs = df
      .select(col(sourceCol).as("src"),
        explode(TextAnalysis.shingles(TextAnalysis.tokens(col(textCol)), n))
          .as("shingle"))
      .select(col("src"), col("shingle"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("i"))
      .select(col("src"), col("i"),
        md5(concat(col("shingle"), lit("#"), col("i"))).as("h"))
      .groupBy("src", "i").agg(min(col("h")).as("h"))
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.i") === col("b.i") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(graft.queries.Det.r6(
        sum(when(col("a.h") === col("b.h"), 1).otherwise(0))
          .cast("double") / numHashes).as("est_jaccard"))
  }
}
