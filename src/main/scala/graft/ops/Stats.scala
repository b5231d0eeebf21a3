package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Det._

/** Distribution statistics: fixed-width histograms and per-key z-score
  * anomaly flagging. Cross-engine determinism comes from integer moment
  * sums (exact in BIGINT) and spelling the final double arithmetic
  * identically on both engines — division, multiply, and sqrt are all
  * correctly-rounded IEEE ops, so identical inputs give identical bits.
  */
object Stats {

  /** Fixed-width histogram of `valueCol` over its observed [min, max]:
    * `nBins` equal bins, top edge clamped into the last bin. One
    * map-side pass against a broadcast 1-row bounds frame, then a
    * `nBins`-row aggregate: the 100 TB-safe histogram shape.
    */
  def fixedWidthHistogram(
      df: DataFrame,
      valueCol: String,
      nBins: Int): DataFrame = {
    val bounds = df.agg(
      min(col(valueCol)).as("_lo"), max(col(valueCol)).as("_hi"))
    df.crossJoin(broadcast(bounds))
      .select(
        least(
          floor((col(valueCol) - col("_lo")) /
            ((col("_hi") - col("_lo")) / nBins)),
          lit((nBins - 1).toDouble)).cast("int").as("bin"),
        col(valueCol).as("_v"), col("_lo"), col("_hi"))
      .groupBy("bin")
      .agg(
        // bin edge re-derived from the broadcast bounds riding along
        first(col("_lo") + col("bin") * ((col("_hi") - col("_lo")) / nBins))
          .as("bin_lo"),
        count(lit(1)).as("n"),
        davg(col("_v")).as("avg_value"))
  }

  /** Per-key anomaly days: bucket events per (`keyCol`, day), compute
    * each key's own count mean/stddev from exact integer moment sums,
    * and flag buckets beyond `zThreshold` sigmas. Keys with a single
    * bucket have no variance and are skipped.
    */
  def dailyCountAnomalies(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      zThreshold: Double): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val mean = col("_sm").cast("double") / col("_n")
    val variance =
      (col("_sq").cast("double") - col("_sm").cast("double") * col("_sm").cast("double") / col("_n")) /
        (col("_n") - 1)
    val stats = daily
      .groupBy(keyCol)
      .agg(count(lit(1)).as("_n"), sum(col("cnt")).as("_sm"),
        sum(col("cnt") * col("cnt")).as("_sq"))
      .filter(col("_n") > 1)
      .withColumn("_mean", mean)
      .withColumn("_var", variance)
      // zero variance would make z = 0/0 = NaN, and BOTH engines order
      // NaN above every threshold — flag nothing for constant series
      .filter(col("_var") > 0)
    daily
      .join(stats, Seq(keyCol)) // both sides just shuffled on the key
      .withColumn("zscore",
        (col("cnt").cast("double") - col("_mean")) / sqrt(col("_var")))
      .filter(abs(col("zscore")) > zThreshold)
      .select(col(keyCol), col("day"), col("cnt"), r6(col("zscore")).as("zscore"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per group — the
    * cardinality estimator whose ESTIMATE is hash-checkable exactly,
    * unlike HLL (q_vocab_sketch gates HLL within a band; KMV's state is
    * the k smallest md5 values, so two engines computing it get the
    * same bits). Estimator (Bar-Yossef et al. 2002): with u_k = the
    * k-th smallest hash mapped into (0,1), estimate = (k−1)/u_k; a
    * group with fewer than k distinct values short-circuits to its
    * exact count. Relative std error ≈ 1/√(k−2).
    *
    * Output per group: `n_kept` (≤ k), `est` (r6). Callers wanting an
    * accuracy gate join the exact distinct count themselves — the
    * sketch never needs it.
    *
    * Scale shape: ONE narrow md5 projection into the bounded
    * [[graft.functions.BottomKStrings]] aggregator — partial buffers of
    * ≤ k hashes per map task, a shuffle of groups × k strings, no
    * distinct-exchange of the full value domain (that exchange is
    * exactly what the sketch exists to avoid at 100 TB). The 60-bit
    * hash-to-fraction map reuses the [[Profile.tableChecksum]]
    * `conv(substr(md5, 1, 15))` spelling.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 128): DataFrame = {
    val bk = udaf(new graft.functions.BottomKStrings(k))
    df.select(col(groupCol), md5(col(valueCol)).as("_h"))
      .groupBy(groupCol)
      .agg(bk(col("_h")).as("_sk"))
      .select(col(groupCol) +: estCols(col("_sk"), k): _*)
  }

  /** `(n_kept, est)` from a KMV sketch array — shared by the per-group
    * sketch and any merge of sketches.
    */
  private def estCols(sk: Column, k: Int): Seq[Column] = {
    val uK = conv(substring(element_at(sk, k), 1, 15), 16, 10)
      .cast("double") / lit(math.pow(2, 60))
    Seq(
      size(sk).cast("long").as("n_kept"),
      when(size(sk) < k, size(sk).cast("double"))
        .otherwise(r6(lit((k - 1).toDouble) / uK)).as("est"))
  }

  /** KMV sketch MERGE — the property that makes a sketch a 100 TB tool:
    * per-partition (per-day, per-source) sketches pre-aggregate once,
    * and any later union's cardinality comes from merging the k-string
    * states (union, dedupe, keep the k smallest) with NO re-scan of the
    * underlying data. Emits one row per unordered group pair with the
    * union estimate — e.g. "how many distinct shingles would sources A
    * and B cover together", the mixing-recipe coverage question.
    *
    * The merge is declarative array algebra over the sketch frame
    * (groups × k strings — driver-scale), so the pair join is trivially
    * broadcastable; the corpus-sized work happened once in
    * [[kmvDistinct]]'s bounded aggregate.
    */
  def kmvUnionEstimate(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 128): DataFrame = {
    val bk = udaf(new graft.functions.BottomKStrings(k))
    val sk = df.select(col(groupCol), md5(col(valueCol)).as("_h"))
      .groupBy(groupCol)
      .agg(bk(col("_h")).as("_sk"))
    val a = sk.select(col(groupCol).as("g_a"), col("_sk").as("_ska"))
    val b = sk.select(col(groupCol).as("g_b"), col("_sk").as("_skb"))
    val merged = slice(
      array_sort(array_distinct(concat(col("_ska"), col("_skb")))), 1, k)
    a.join(broadcast(b), col("g_a") < col("g_b"))
      .withColumn("_sk", merged)
      .select(col("g_a") +: col("g_b") +: estCols(col("_sk"), k): _*)
  }

  /** Count-min sketch bucket for hash row `r`: the [[Corpus.hashBucket]]
    * md5 discipline with the row index mixed into the key, so the d hash
    * functions are independent and both engines spell the identical
    * integer — DuckDB:
    * `('0x' || substr(md5(salt || '|' || r || '|' || item), 1, 8))::BIGINT % w`.
    */
  private def cmsBucket(item: Column, row: Column, w: Int, salt: String): Column =
    conv(substring(
        md5(concat_ws("|", lit(salt), row.cast("string"), item)), 1, 8), 16, 10)
      .cast("long") % w

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over an item
    * OCCURRENCE frame: the frequency estimator whose state is a fixed
    * d×w integer table, mergeable by cellwise addition — the
    * heavy-hitter counting sketch for streams and shards that, unlike
    * [[graft.functions.MisraGries]] (which keeps exact survivors), can
    * answer a point query for ANY item after the fact.
    *
    * State is a (row, bucket, cnt) frame of ≤ d·w rows. Each occurrence
    * increments one bucket per hash row; md5-derived buckets make the
    * table — and therefore every ESTIMATE — bit-identical cross-engine,
    * so the gate hash-checks the estimator itself, not just a band.
    *
    * Scale shape: one explode(×d) feeding a hash aggregate whose
    * distinct-key space is capped at d·w regardless of corpus size —
    * map-side partial aggregation collapses each task to ≤ d·w rows, so
    * the shuffle is constant-bounded: the sketch IS the reduction.
    */
  def cmsBuild(
      occurrences: DataFrame,
      itemCol: String,
      d: Int = 4,
      w: Int = 256,
      salt: String = "cms"): DataFrame = {
    require(d > 0 && w > 0)
    occurrences
      .select(col(itemCol).as("_it"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .groupBy(col("r"), cmsBucket(col("_it"), col("r"), w, salt).as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch: each query item reads its d buckets and
    * takes the min — the CMS guarantee is est ≥ true count always,
    * est ≤ true + εN with probability 1−δ (ε = e/w, δ = e^−d). Missing
    * buckets count 0. The join is queries×d rows against the ≤ d·w-row
    * sketch — broadcast-sized by construction.
    */
  def cmsEstimate(
      sketch: DataFrame,
      queries: DataFrame,
      itemCol: String,
      d: Int = 4,
      w: Int = 256,
      salt: String = "cms"): DataFrame = {
    val q = queries
      .select(col(itemCol),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("b", cmsBucket(col(itemCol), col("r"), w, salt))
    q.join(broadcast(sketch), Seq("r", "b"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Merge two CMS states built with the same (d, w, salt): cellwise
    * addition. merge(build(A), build(B)) == build(A ∪ B) exactly — the
    * per-shard/per-day pre-aggregation contract, spec-proven like
    * [[kmvUnionEstimate]]'s.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("r", "b")
      .agg(sum(col("cnt")).as("cnt"))

  /** Per-group MAD (median absolute deviation) outlier summary — the
    * robust twin of [[dailyCountAnomalies]]' z-score: median and MAD
    * are insensitive to the very outliers they flag, so a fat tail
    * cannot hide itself by inflating the sigma. Exact-discrete medians
    * (`percentile_disc`, data values — engine-exact like
    * [[graft.ops.Features.winsorizeSummary]]'s cuts); the deviation
    * |x − med| is one IEEE subtraction both engines spell identically,
    * and the second percentile runs over those derived values. Emits
    * per group: n, median, mad, and the count beyond `k`·MAD.
    *
    * Scale shape: two percentile aggregates and one broadcast join —
    * the winsorize shape, one extra pass for the second-order median.
    */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol)).agg(
      expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $valCol)").as("_med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("_dev", abs(col(valCol) - col("_med")))
    val mad = dev.groupBy(col(groupCol)).agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _dev)").as("_mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        max(col("_med")).as("median"),
        max(col("_mad")).as("mad"),
        sum(when(col("_dev") > lit(k) * col("_mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Benford first-digit audit of a currency-like column: observed
    * first-significant-digit frequencies vs the Benford expectation
    * log10(1 + 1/d), with the per-digit chi-square contribution — the
    * fabricated-data / broken-feed smell test. Values go through
    * exact-cents integerization (`⌊100·v + 0.5⌋`, the engine's r6
    * family) and the digit comes from integer string length — both
    * engine-stable — never from log10 of the value (whose ulp at exact
    * powers of ten could flip the digit).
    */
  def benford(df: DataFrame, valCol: String): DataFrame = {
    val cents = floor(col(valCol) * 100 + lit(0.5)).cast("long")
    val base = df.filter(col(valCol).isNotNull && cents > 0)
      .withColumn("_c", cents)
      .withColumn("digit",
        floor(col("_c") / pow(lit(10.0), length(col("_c").cast("string")) - 1))
          .cast("int"))
    val tot = base.agg(count(lit(1)).as("_n"))
    // Spark's log(base, x) evaluates ln(x)/ln(base) — the oracle spells
    // exactly that ratio, never DuckDB's direct log10
    val l10 = log(10.0, lit(1.0) + lit(1.0) / col("digit"))
    base.groupBy("digit")
      .agg(count(lit(1)).as("n_d"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n_d"),
        r6(col("n_d").cast("double") / col("_n")).as("freq"),
        r6(l10).as("expected"),
        r6((col("n_d") - col("_n") * l10) * (col("n_d") - col("_n") * l10) /
          (col("_n") * l10)).as("chi_term"))
  }

  /** Concentration metrics per group: Herfindahl–Hirschman index and
    * Gini coefficient of how `valCol` mass distributes over units —
    * "is this event type driven by three whales", the
    * skew-risk/fairness audit in one pass. HHI sums r6'd squared
    * shares (r6-before-sum); Gini uses the sorted-rank identity
    * `G = (2·Σ i·s_i − (n+1)·Σ s_i) / (n·Σ s_i)` with ranks from a
    * per-group window on (s, unit) — integer×DECIMAL exact sums, ONE
    * final double division. Requires non-negative unit masses.
    *
    * Scale shape: one (group, unit) aggregate, one group-partitioned
    * rank window (bounded by units-per-group), two group aggregates.
    */
  def concentration(
      df: DataFrame,
      groupCol: String,
      unitCol: String,
      valCol: String): DataFrame = {
    val unitSums = df.groupBy(col(groupCol), col(unitCol))
      .agg(sum(col(valCol).cast("decimal(25,6)")).as("_s"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_s"), col(unitCol))
    val ranked = unitSums.withColumn("_i", row_number().over(w))
    val tot = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_units"), sum(col("_s")).as("_tot"),
      sum(col("_i").cast("decimal(12,0)") * col("_s").cast("decimal(24,6)"))
        .as("_ws"))
    val share = col("_s").cast("double") / col("_tot").cast("double")
    val hhi = ranked.join(tot.select(col(groupCol), col("_tot")), groupCol)
      .withColumn("_sh2", r6(share * share))
      .groupBy(col(groupCol))
      .agg(r6(sum(col("_sh2").cast("decimal(25,6)")).cast("double")).as("hhi"))
    tot.join(hhi, groupCol)
      .select(col(groupCol), col("n_units"), col("hhi"),
        r6((lit(2.0) * col("_ws").cast("double") -
            (col("n_units") + 1).cast("double") * col("_tot").cast("double")) /
          (col("n_units").cast("double") * col("_tot").cast("double")))
          .as("gini"))
  }

  /** A/B test readout: two-proportion z-test on a per-unit binary
    * outcome, with the variant assigned by the [[Corpus.hashBucket]]
    * md5 split — deterministic, uniform, reproducible across reruns and
    * engines (the experiment-assignment discipline every hash-split op
    * here shares). One output row: unit and conversion counts per arm,
    * rates, absolute lift, and the pooled z statistic
    * `(p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))`.
    *
    * Determinism: all counts are exact integers; the z expression is
    * one identical double tree (divisions, sqrt — correctly-rounded
    * IEEE ops) off those integers, then r6. No ln, no transcendentals.
    *
    * Scale shape: one per-unit aggregate (max of the outcome flag), one
    * 2-row aggregate, one 1-row pivot — after the first hash exchange
    * on the unit key, nothing is data-sized.
    */
  def abTest(
      df: DataFrame,
      unitCol: String,
      outcomeCol: String,
      salt: String = "ab"): DataFrame = {
    val perUnit = df.groupBy(col(unitCol))
      .agg(max(col(outcomeCol).cast("int")).as("_conv"))
      .withColumn("_arm", Corpus.hashBucket(col(unitCol), salt, 2))
    val arms = perUnit.groupBy("_arm")
      .agg(count(lit(1)).as("_n"), sum(col("_conv")).as("_c"))
    val one = arms.agg(
      max(when(col("_arm") === 0, col("_n"))).as("n_a"),
      max(when(col("_arm") === 0, col("_c"))).as("conv_a"),
      max(when(col("_arm") === 1, col("_n"))).as("n_b"),
      max(when(col("_arm") === 1, col("_c"))).as("conv_b"))
    val pa = col("conv_a").cast("double") / col("n_a")
    val pb = col("conv_b").cast("double") / col("n_b")
    val pooled = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    one.select(
      col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      r6(pa).as("rate_a"), r6(pb).as("rate_b"),
      r6(pa - pb).as("lift"),
      // a degenerate experiment (nobody or everybody converted) has no
      // defined z — NULL, not a division by zero under ANSI mode
      when(col("conv_a") + col("conv_b") > 0 &&
          col("conv_a") + col("conv_b") < col("n_a") + col("n_b"),
        r6((pa - pb) / sqrt(pooled * (lit(1.0) - pooled) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))).as("z"))
  }

  /** 2-D skyline (Pareto frontier), both dimensions MINIMIZED: the
    * points no other point dominates (other ≤ in both dims, < in at
    * least one). The frontier is computed over DISTINCT (x, y) pairs —
    * exact duplicates never dominate each other, so the frontier is a
    * point set by definition.
    *
    * Two-phase distributed plan. Skyline is distributive over ANY
    * partitioning — a point dominated inside a subset is dominated
    * globally, and sky(∪Pᵢ) = sky(∪ sky(Pᵢ)) — so phase 1 prunes
    * each of `nBuckets` hash buckets independently with the sorted
    * sweep (order by (x asc, y asc); survivor ⇔ y strictly below the
    * running min over preceding rows: any earlier row has x' < x, or
    * x' = x with y' < y, either way dominance ⇔ y' ≤ y), and phase 2
    * runs the same sweep once over the bucket survivors. The global
    * sort is therefore paid only on the pruned candidate set, not the
    * input — at 100 TB the single-partition phase-2 window sees
    * ~frontier-size × nBuckets rows. (Worst case the data is one big
    * anti-chain and the frontier IS the input — output-sized cost no
    * algorithm avoids.)
    */
  def skyline2D(
      df: DataFrame,
      xCol: String,
      yCol: String,
      nBuckets: Int = 32): DataFrame = {
    val pts = df.select(col(xCol).as("x"), col(yCol).as("y")).distinct()
    def sweep(in: DataFrame, parts: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(parts: _*)
        .orderBy(col("x").asc, col("y").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      in.withColumn("_miny", min(col("y")).over(w))
        .filter(col("_miny").isNull || col("y") < col("_miny"))
        .drop("_miny")
    }
    val local = sweep(
      pts.withColumn("_bkt", pmod(hash(col("x"), col("y")), lit(nBuckets))),
      Seq(col("_bkt"))).drop("_bkt")
    sweep(local, Seq.empty)
      .select(col("x").as(xCol), col("y").as(yCol))
  }

  /** Mutual information between two categorical columns — the
    * dependence audit behind feature selection and leakage checks
    * (χ² tells you IF the columns associate; MI tells you how many
    * nats of one the other carries). Emits the full per-cell PMI
    * table — `term = p(x,y)·ln(p(x,y)/(p(x)p(y)))` — plus the total
    * repeated per row (the q_calibration 1-row-broadcast pattern), so
    * the hot cells driving the dependence are inspectable.
    *
    * Scale shape: three hash aggregates (cell, x-margin, y-margin; the
    * margins broadcast back) + one 1-row total. Determinism: all
    * counts are exact integers below 2^53, each term is one ln of an
    * exact-integer ratio (`n_xy·N / (n_x·n_y)`) times one division,
    * r6'd before the decimal total.
    */
  def mutualInformation(
      df: DataFrame,
      xCol: String,
      yCol: String): DataFrame = {
    val base = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    val cells = base.groupBy("x", "y").agg(count(lit(1)).as("n_xy"))
    val mx = base.groupBy("x").agg(count(lit(1)).as("_nx"))
    val my = base.groupBy("y").agg(count(lit(1)).as("_ny"))
    val n = base.agg(count(lit(1)).as("_n"))
    val terms = cells
      .join(broadcast(mx), "x")
      .join(broadcast(my), "y")
      .crossJoin(broadcast(n))
      .withColumn("term", r6(
        (col("n_xy").cast("double") / col("_n").cast("double")) *
          log((col("n_xy").cast("double") * col("_n").cast("double")) /
            (col("_nx").cast("double") * col("_ny").cast("double")))))
    val mi = terms
      .agg(r6(sum(col("term").cast("decimal(25,6)")).cast("double"))
        .as("mi"))
    terms.crossJoin(broadcast(mi))
      .select(col("x"), col("y"), col("n_xy"), col("term"), col("mi"))
      .orderBy("x", "y")
  }

  /** One replicate's per-partition bootstrap partial: replicate index
    * `b`, Σw in `n`, and the floor-scaled long term sum in `s`.
    */
  private[ops] case class BootCell(b: Int, n: Long, s: Long)

  /** Poisson(1) cumulative probabilities, shared verbatim with the
    * oracle spelling so the inverse-CDF cut points are bit-identical
    * in both engines (the PPR literal-interpolation discipline).
    */
  private[ops] val PoissonCum: Seq[Double] = {
    val probs = Iterator.iterate(math.exp(-1.0) -> 0) {
      case (p, k) => (p / (k + 1), k + 1)
    }.map(_._1).take(9).toSeq
    probs.scanLeft(0.0)(_ + _).tail // cum P(X <= k), k = 0..8
  }

  /** Bootstrap confidence interval for the mean by deterministic
    * multiplier bootstrap (the Poisson-weight form used by
    * bag-of-little-bootstraps pipelines, Kleiner et al. 2014): each
    * row gets `b` replicate weights w ~ Poisson(1) drawn from the md5
    * hash of (row id, replicate) via the inverse CDF, each replicate's
    * weighted mean is computed with DECIMAL sums, and the CI is read
    * off the replicate means' order statistics (2.5%/97.5% ranks).
    * Hash-seeded like [[Privacy.noisyCounts]]: the resample — and so
    * the CI — replays exactly under any partitioning.
    *
    * Scale shape (rewritten r14, the [[LinAlg.gramCov]] discipline): a
    * per-partition fused fold walks each row once, computes its b
    * md5-derived weights in a primitive loop (same digest bytes as the
    * codegen spelling — first 4 digest bytes == the hex-prefix conv),
    * and accumulates b (Σw, Σfloor(w·x·1e6+0.5)) long pairs per
    * partition; ONE b-row partial per partition then merges in a tiny
    * long-sum group-by, windows only over the b-row frame. The
    * logical N·b replicate blow-up (the documented cost knob —
    * production subsamples first) never materializes as rows. The
    * prior explode spelling is kept as [[bootstrapMeanCIExplode]] for
    * the A/B; Round14Spec pins bit-equality between the two.
    * Determinism (r11): each term rounds to the 6-dp grid as the SAME
    * IEEE expression in both engines — `floor(w·x·1e6+0.5)` — and
    * accumulates as a LONG (the per-wedge-BigDecimal lesson from
    * q_adamic: a 64M-row accumulate should be a long add, not a heap
    * decimal add); the long→double conversion is correctly rounded on
    * both sides (Spark cast; DuckDB via VARCHAR, since its HUGEINT sum
    * would double-round past 2^53), then one identical double division
    * chain per replicate and exact order statistics over b values.
    * Long-sum domain: |Σ w·x·1e6| < 2^63 per replicate — ~9.2e12 units
    * of weighted magnitude, far past any explode this op permits.
    */
  def bootstrapMeanCI(
      df: DataFrame,
      idCol: String,
      valCol: String,
      b: Int = 64,
      salt: String = "boot"): DataFrame = {
    requireReplicateBounds(b)
    val buckets = 1 << 20
    // cast the id to string HERE so the fold sees exactly the string
    // the explode spelling's concat_ws saw (Spark cast semantics, not
    // a JVM toString)
    val base = df.filter(col(valCol).isNotNull)
      .select(col(idCol).cast("string").as("_id"),
        col(valCol).cast("double").as("_x"))
    val nRep = b
    val saltLocal = salt
    val cums: Array[Double] = PoissonCum.toArray
    val cells = base.mapPartitions { it =>
      val ns = new Array[Long](nRep)
      val ss = new Array[Long](nRep)
      var any = false
      val md = java.security.MessageDigest.getInstance("MD5")
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val saltBytes = saltLocal.getBytes(utf8)
      val sep = "|".getBytes(utf8)
      val bBytes = Array.tabulate(nRep)(_.toString.getBytes(utf8))
      val dig = new Array[Byte](16)
      while (it.hasNext) {
        val row = it.next()
        val x = row.getDouble(1)
        // concat_ws skips a NULL id entirely (no separator either)
        val idBytes =
          if (row.isNullAt(0)) null else row.getString(0).getBytes(utf8)
        any = true
        var k = 0
        while (k < nRep) {
          md.reset()
          md.update(saltBytes)
          if (idBytes != null) { md.update(idBytes); md.update(sep) }
          md.update(bBytes(k))
          md.digest(dig, 0, 16)
          // first 8 hex chars of the digest == unsigned int of the
          // first 4 bytes (conv(substr(md5, 1, 8), 16, 10) % buckets)
          val v = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
            ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
          val u = ((v % buckets) + 0.5) / buckets.toDouble
          var w = 0
          while (w < cums.length && !(u < cums(w))) w += 1
          ns(k) += w
          // floor(w·x·1e6 + 0.5) as the explode spelling computes it —
          // long*double promotes left-to-right, floor(0.5)=0 when w=0
          ss(k) += math.floor(w.toDouble * x * 1e6 + 0.5).toLong
          k += 1
        }
      }
      if (!any) Iterator.empty
      else Iterator.range(0, nRep).map(k => BootCell(k, ns(k), ss(k)))
    }(Encoders.product[BootCell])
    val reps = cells.groupBy(col("b").as("_b"))
      .agg(sum(col("n")).as("_n"), sum(col("s")).as("_s"))
    replicateCI(reps, base)
  }

  /** The pre-r14 spelling of [[bootstrapMeanCI]], kept verbatim for
    * the A/B: a 64×-explode whose per-(row, replicate) weight runs
    * through codegen'd string concat + md5 + hex conv + a 10-arm CASE,
    * materializing N·b rows into the hash aggregate. Semantically
    * identical to the fused fold (Round14Spec pins bit-equality);
    * physically ~10× the wall-clock for the same shuffle (the partial
    * aggregate already collapsed each partition to b rows — the cost
    * was per-exploded-row evaluation overhead, the q_gram lesson).
    */
  private[graft] def bootstrapMeanCIExplode(
      df: DataFrame,
      idCol: String,
      valCol: String,
      b: Int = 64,
      salt: String = "boot"): DataFrame = {
    requireReplicateBounds(b)
    val buckets = 1 << 20
    val base = df.filter(col(valCol).isNotNull)
      .select(col(idCol).as("_id"), col(valCol).cast("double").as("_x"))
    val rep = base.select(col("_id"), col("_x"),
      explode(sequence(lit(0), lit(b - 1))).as("_b"))
    val u = (Corpus.hashBucket(
      concat_ws("|", col("_id").cast("string"), col("_b").cast("string")),
      salt, buckets).cast("double") + lit(0.5)) / lit(buckets.toDouble)
    val w = PoissonCum.zipWithIndex.foldRight(lit(PoissonCum.size): Column) {
      case ((c, k), rest) => when(u < lit(c), lit(k)).otherwise(rest)
    }.cast("long")
    val reps = rep
      .withColumn("_w", w)
      .groupBy("_b")
      .agg(
        sum(col("_w")).as("_n"),
        sum(floor(col("_w") * col("_x") * lit(1e6) + lit(0.5))
          .cast("long")).as("_s"))
    replicateCI(reps, base)
  }

  private def requireReplicateBounds(b: Int): Unit = {
    require(b >= 4, "need at least 4 replicates for order-statistic CIs")
    // the replicate ranking below is a single-partition window — safe
    // ONLY because its frame is the b-row replicate table, never the
    // data. This bound makes that contract enforced rather than
    // advisory (the topEigen discipline): b beyond it would turn the
    // window into a serialization point, and a bootstrap with
    // thousands of replicates should subsample per replicate (bag of
    // little bootstraps) instead of widening this frame.
    require(b <= 4096,
      s"b=$b replicates: the rank window is bounded by construction " +
        "at b <= 4096 — use bag-of-little-bootstraps subsampling beyond")
  }

  /** Shared tail of both bootstrap spellings: replicate means from the
    * (\_b, \_n, \_s) long partials, order-statistic CI over the b-row
    * frame, overall count/mean from `base`.
    */
  private def replicateCI(repl: DataFrame, base: DataFrame): DataFrame = {
    val reps = repl
      .filter(col("_n") > 0)
      .select(col("_b"),
        r6(col("_s").cast("double") / lit(1e6) / col("_n").cast("double"))
          .as("_m"))
    val ranked = reps.withColumn("_r",
      row_number().over(Window.orderBy(col("_m"), col("_b"))))
      .withColumn("_nb", count(lit(1)).over(Window.partitionBy()))
    val loRank = greatest(floor(col("_nb") * 0.025).cast("long"), lit(1L))
    val hiRank = least(ceil(col("_nb") * 0.975).cast("long"), col("_nb"))
    val ci = ranked.agg(
      min(when(col("_r") === loRank, col("_m"))).as("ci_lo"),
      min(when(col("_r") === hiRank, col("_m"))).as("ci_hi"),
      count(lit(1)).as("n_replicates"))
    val overall = base.agg(
      count(lit(1)).as("n"),
      davg(col("_x")).as("mean"))
    overall.crossJoin(broadcast(ci))
      .select("n", "mean", "n_replicates", "ci_lo", "ci_hi")
  }

  /** DuckDB spelling of [[bootstrapMeanCI]] over an `(id, x)`
    * subquery — the same interpolated Poisson cut points.
    */
  def bootstrapMeanCIOracleSql(
      baseSql: String,
      b: Int,
      salt: String = "boot"): String = {
    val r6s = graft.queries.Oracle.r6 _
    val bk = 1 << 20
    val h = s"(('0x' || substr(md5('$salt' || id::VARCHAR || '|' || " +
      s"t.b::VARCHAR), 1, 8))::BIGINT % $bk)"
    val uExpr = s"(($h::DOUBLE + 0.5) / $bk.0)"
    val ladder = PoissonCum.zipWithIndex
      .map { case (c, k) => s"WHEN u < ${c}::DOUBLE THEN $k" }
      .mkString(" ")
    s"WITH base AS (SELECT id, x::DOUBLE AS x FROM ($baseSql) " +
      "WHERE x IS NOT NULL), " +
      s"rep AS (SELECT id, x, t.b, $uExpr AS u FROM base, " +
      s"unnest(range(0, $b)) AS t(b)), " +
      s"wt AS (SELECT b, x, CASE $ladder ELSE ${PoissonCum.size} END " +
      "AS w FROM rep), " +
      "reps AS (SELECT b, " +
      // the engine's floor-scaled LONG sum, replayed term-for-term:
      // same IEEE product/round, VARCHAR-routed int->double (DuckDB's
      // HUGEINT sum would double-round past 2^53), same division chain
      r6s("CAST(CAST(sum(CAST(floor(w * x * 1e6 + 0.5) AS BIGINT)) " +
        "AS VARCHAR) AS DOUBLE) / 1e6 / sum(w)") +
      " AS m FROM wt GROUP BY b HAVING sum(w) > 0), " +
      "rk AS (SELECT m, b, row_number() OVER (ORDER BY m, b) AS r, " +
      "count(*) OVER () AS nb FROM reps), " +
      "ci AS (SELECT min(CASE WHEN r = greatest(CAST(floor(nb * 0.025) " +
      "AS BIGINT), 1) THEN m END) AS ci_lo, " +
      "min(CASE WHEN r = least(CAST(ceil(nb * 0.975) AS BIGINT), nb) " +
      "THEN m END) AS ci_hi, count(*)::BIGINT AS n_replicates FROM rk), " +
      "o AS (SELECT count(*)::BIGINT AS n, " +
      graft.queries.Oracle.davg("x") + " AS mean FROM base) " +
      "SELECT n, mean, n_replicates, ci_lo, ci_hi FROM o CROSS JOIN ci"
  }

  /** DuckDB spelling of [[mutualInformation]] over a `(x, y)`
    * subquery.
    */
  def mutualInformationOracleSql(baseSql: String): String = {
    val r6s = graft.queries.Oracle.r6 _
    s"WITH b AS (SELECT x, y FROM ($baseSql) " +
      "WHERE x IS NOT NULL AND y IS NOT NULL), " +
      "c AS (SELECT x, y, count(*)::BIGINT AS n_xy FROM b GROUP BY 1, 2), " +
      "mx AS (SELECT x, count(*)::BIGINT AS nx FROM b GROUP BY 1), " +
      "my AS (SELECT y, count(*)::BIGINT AS ny FROM b GROUP BY 1), " +
      "t AS (SELECT count(*)::BIGINT AS n FROM b), " +
      "tm AS (SELECT c.x, c.y, c.n_xy, " +
      r6s("(n_xy::DOUBLE / n::DOUBLE) * " +
        "ln((n_xy::DOUBLE * n::DOUBLE) / (nx::DOUBLE * ny::DOUBLE))") +
      " AS term FROM c JOIN mx USING (x) JOIN my USING (y) CROSS JOIN t), " +
      "mi AS (SELECT " +
      r6s("CAST(CAST(sum(CAST(term AS DECIMAL(25,6))) AS VARCHAR) AS DOUBLE)") +
      " AS mi FROM tm) " +
      "SELECT x, y, n_xy, term, mi FROM tm CROSS JOIN mi ORDER BY x, y"
  }
}
