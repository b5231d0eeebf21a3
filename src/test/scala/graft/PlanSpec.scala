package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}
import graft.queries.RefQueries
import graft.sources.Tables

/** Physical-plan regression tests: the properties the 100 TB design
  * depends on must be visible in `explain`, not assumed — a silent
  * regression to a cartesian product or an unpruned scan is invisible at
  * test scale and fatal at cluster scale (SURVEY.md §4.2).
  */
class PlanSpec extends SparkTestBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("parquet scan: predicate pushed down and columns pruned") {
    val df = Tables.table(spark, Sf0001, "lineitem")
      .filter(col("l_quantity") > 10)
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10"),
      s"no pushdown in:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"), "scan reads unprojected columns")
  }

  test("tpch q6: all three band predicates push into the scan, 4-column read") {
    val p = plan(graft.queries.SqlSurfaceQueries.qTpchQ6(spark, Sf0001))
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
      "LessThan(l_quantity").foreach(f =>
      assert(pushed.contains(f), s"missing pushed filter $f in:\n$pushed"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_tax"),
      "scan reads columns Q6 never references")
    assert(p.contains("HashAggregate"), "no map-side partial aggregate")
  }

  test("spatial grid join: candidates meet by cell hash equi-join, haversine only post-join") {
    // the radius join must plan as an equi-join on the (cy, cx) cell
    // keys — a BNLJ/cartesian here would mean the theta distance
    // predicate reached the join and the grid bucketing bought nothing
    val p = plan(graft.queries.MiningQueries.qSpatial(spark, Sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"spatial join lost its cell equi-keys:\n$p")
    assert(p.contains("HashJoin"), s"expected a hash equi-join on cells:\n$p")
  }

  test("bitmap build: one hash aggregate keyed by (group, word), no window, no join") {
    val p = plan(graft.ops.Bitmap.build(
      Tables.events(spark, Sf0001), "event_type", "user_id"))
    assert(p.contains("HashAggregate"), s"bitmap build not a hash aggregate:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"bitmap build should be aggregate-only:\n$p")
  }

  test("hot paths run inside whole-stage codegen, custom expressions included") {
    // the `*(n)` star marks a WholeStageCodegen span in the physical
    // plan string; a scan→filter→project chain outside one means a
    // per-row interpreter walk on the 100 TB path
    // execute first: AQE only materializes (and codegen-compiles) the
    // final plan on run, and the star markers appear on the final plan
    def stars(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    val etl = stars(RefQueries.qDerive(spark, Sf0001))
    assert(etl.contains("*("), s"ETL derivation chain not codegen'd:\n$etl")
    // the custom Catalyst expressions must live INSIDE a codegen span,
    // not fall back to interpreted eval (they all implement doGenCode;
    // this pins that the registration path keeps it)
    val sim = stars(graft.queries.ExtQueries.queries("q_dedup_simhash")(spark, Sf0001))
    assert("""\*\(\d+\) Project \[.*simhash""".r.findFirstIn(sim).isDefined,
      s"simhash64 projection not inside a codegen span:\n$sim")
  }

  test("filterless min/max/count answers from parquet footer statistics") {
    // aggregate pushdown exists only on the DataSource V2 scan; parquet
    // defaults to the V1 path, so flip it for this plan only. Timestamp
    // columns are excluded from footer-stat pushdown (Spark guards
    // against int96/timezone ambiguity), so the exhibit uses a long key.
    val key = "spark.sql.sources.useV1SourceList"
    val saved = spark.conf.get(key)
    spark.conf.set(key, "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try {
      val p = plan(Tables.table(spark, Sf0001, "lineitem")
        .agg(count(lit(1)).as("n"), min("l_orderkey").as("lo"),
          max("l_orderkey").as("hi")))
      assert(p.contains("PushedAggregation: [COUNT(*)"),
        s"aggregate not pushed into the scan:\n$p")
      assert(p.contains("MIN(l_orderkey)") && p.contains("MAX(l_orderkey)"),
        s"min/max not pushed:\n$p")
    } finally spark.conf.set(key, saved)
  }

  test("q_join plans as a broadcast hash left-outer join, not a shuffle") {
    val p = plan(RefQueries.qJoin(spark, Sf0001))
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join in:\n$p")
    assert(p.contains("LeftOuter"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q_agg runs partial+final hash aggregation around one exchange") {
    val p = plan(RefQueries.qAgg(spark, Sf0001))
    val nAgg = p.linesIterator.count(_.contains("HashAggregate ("))
    assert(nAgg >= 2, s"expected partial+final HashAggregate in:\n$p")
    assert(p.contains("hashpartitioning"))
  }

  test("filter pipeline stays inside whole-stage codegen") {
    val df = RefQueries.qFilter(spark, Sf0001)
    df.collect() // AQE finalizes codegen spans only on execution
    val p = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark whole-stage-codegen spans in tree form;
    // scan→filter→project must share one span (no interpreted break)
    assert(p.contains("*(1) Filter") && p.contains("*(1) Project"),
      s"filter/project not fused into one codegen span:\n$p")
  }

  test("brute-force top-k broadcasts the query side (no cartesian shuffle)") {
    val emb = Tables.table(spark, Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val p = plan(Similarity.cosineTopK(q, c, 5))
    assert(p.contains("BroadcastNestedLoopJoin"), s"cross join not broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"), "cross join fell back to a full shuffle")
  }

  test("typed top-k aggregator pre-reduces map-side (partial+final)") {
    val emb = Tables.table(spark, Sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val p = plan(Similarity.cosineTopKAgg(q, c, 5))
    val nAgg = p.linesIterator.count(l =>
      l.contains("ObjectHashAggregate (") || l.contains("SortAggregate ("))
    assert(nAgg >= 2, s"expected partial+final typed aggregation in:\n$p")
  }

  test("LSH candidate generation: one signature pass, no join, no all-pairs") {
    val docs = Tables.table(spark, Sf0001, "documents")
    val p = plan(Dedup.lshCandidatePairs(docs, "doc_id", "text"))
    assert(!p.contains("Join"), s"bucket grouping must not self-join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"pair generation must never be all-pairs:\n$p")
    // exactly one scan of the documents table: the signature pipeline is
    // not duplicated across join branches
    val nScans = p.linesIterator.count(_.trim.matches("""\(\d+\) Scan parquet\s*"""))
    assert(nScans == 1, s"expected a single documents scan in:\n$p")
    assert(p.contains("band_hash"))
  }

  test("range join plans as an equi-join on the bucket, never a cartesian") {
    import graft.queries.ExtQueries
    val p = plan(ExtQueries.qRange(spark, Sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a theta join:\n$p")
    assert(p.contains("_bucket"), s"bucket key missing from the join:\n$p")
  }

  test("bucketed tables co-locate the fact join: no shuffle before the join") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val base = java.nio.file.Files.createTempDirectory("bucket_plan").toString
      graft.etl.Layout.writeBucketed(Tables.table(spark, Sf0001, "lineitem"),
        "li_bucketed", s"$base/li", "l_orderkey", 8)
      graft.etl.Layout.writeBucketed(Tables.table(spark, Sf0001, "orders"),
        "ord_bucketed", s"$base/ord", "o_orderkey", 8)
      val j = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join in:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"scan not bucket-aware:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("no gate query plans a cartesian; BNLJ only where broadcast is the design") {
    // BNLJ is CORRECT where a tiny frame broadcasts against a cross/theta
    // join (brute-force top-k's query side, 1-row corpus stats); anywhere
    // else it means a join lost its equi-keys and would melt at scale.
    // (q_asof: the packed right side is ONE broadcast array row;
    // q_sim_ivf: cell assignment scores every vector against the
    // broadcast centroid set — a deliberate map-side cross join)
    // (q_surprisal: 1-row vocab scalar broadcast, like q_tfidf)
    // (q_kmeans: Lloyd assignment IS a broadcast cross join — k centroid
    // rows against the corpus, plus the 1-row stride count)
    // (q_histogram: 1-row min/max bounds frame broadcast against the
    // corpus for the map-side bin assignment)
    // (q_pagerank: 1-row vertex-count frame broadcast for the uniform
    // init and the per-iteration teleport term)
    // (q_decay: 1-row corpus max-day frame broadcast for the age term)
    // (q_semdedup: inherits q_kmeans' broadcast-Lloyd cross join)
    // (q_sim_ivfpq: broadcast-centroid cell assignment, like q_sim_ivf)
    // (q_sim_hamming: broadcast query side against the packed corpus —
    // the binary-code scan, like q_sim_topk)
    // (q_dsir / q_ppl_band / q_mix_temp: Selection's 1-row or tiny-frame
    // broadcasts — λ normalizer totals, calibration cuts, weight sums)
    // (q_tpch_q22: the 1-row global-threshold broadcast)
    // (q_tpch_q11 / q_tpch_q15: the same 1-row scalar-subquery broadcast
    // — the value threshold and the max-revenue row)
    // (q_kl_drift / q_chi2 / q_bm25: 1-row corpus-stat broadcasts — the
    // token total, the N marginal, the N/avgdl frame)
    // (q_neg_sample: the broadcast negative-pool theta join — the pool
    // is poolSize rows by construction)
    // (q_ann_recall: composes q_sim_topk's broadcast-query cross join —
    // the exact side of the recall comparison; _ivf and _trunc compose
    // the same exact side)
    // (q_pmi: 1-row unigram/bigram total broadcasts)
    // (q_ks_drift: 1-row group-size and max-gap broadcasts; the bucket
    // offsets join is an equi-join, not a BNLJ)
    // (q_kmv_union: the g_a < g_b pair theta-join over the SKETCH frame
    // — groups × k strings, broadcast by construction)
    // (q_skew_audit: the 1-row fanout-total broadcast)
    // (q_target_enc: the 1-row global-mean broadcast)
    // (q_basket: the 1-row basket-count broadcast for the support ratio)
    // (q_bins: the 1-row percentile-cuts frame broadcast for map-side
    // bin assignment — the q_histogram shape)
    // (q_jaro: the distinct-NAME pair matrix — vocabulary-sized theta
    // join over a broadcast 64-row frame, the expression-parity gate)
    // (q_bitmap: the groups × groups pair seed over the group-size
    // frame — group-cardinality-sized by construction)
    // (q_psi / q_quantile_norm: the 1-row totals and nBins/nGrid-row
    // percentile-cut frames broadcast for map-side assignment — the
    // q_histogram shape again)
    // (q_twostage: stage 1 IS q_sim_hamming's broadcast-query packed
    // scan; stage 2 joins only the m survivors)
    // (q_benford: the 1-row total-count broadcast against the 9-digit
    // aggregate — the q_skew_audit scalar shape)
    // (q_sample / q_split: interval contract gates — 1-row count
    // aggregates crossJoined into the 1-row verdict; no row data moves)
    // (q_calibration: the 1-row total and 1-row ECE broadcast against
    // the ≤bins-row bin table — the q_histogram scalar shape)
    // (q_rrf: embeds the q_bm25 scorer, so it inherits bm25's 1-row
    // corpus-stats (N, avgdl) broadcast)
    // (q_hits: the 1-row L1-norm broadcast per half-iteration — the
    // q_pagerank 1-row |V| shape)
    // (q_textrank: pageRankWeighted's 1-row vertex-count broadcast)
    // (q_km: the 1-row corpus-horizon date broadcast under the
    // censoring rule)
    // (q_range_plan: the 1-row B−1-boundary array broadcast every row's
    // partition assignment reads)
    // (q_modularity: the 1-row edge-total broadcast under the null
    // model — the q_pagerank 1-row |V| shape)
    // (q_decompose: the 1-row seasonal-mean broadcast re-centering the
    // ≤7-row day-of-week table)
    // (q_ips: the 1-row log-size broadcast pricing the propensity
    // weights — the q_benford scalar shape)
    // (q_mi: the 1-row corpus total + 1-row MI sum broadcast against
    // the cell table — the q_calibration scalar shape)
    val bnljByDesign = Set("q_sim_topk", "q_sim_topk_agg", "q_top_tokens",
      "q_tfidf", "q_asof", "q_sim_ivf", "q_surprisal", "q_kmeans",
      "q_text_knn", // brute-force top-k: broadcast query side, like q_sim_topk
      "q_histogram", "q_pagerank", "q_decay", "q_semdedup", "q_sim_ivfpq",
      "q_sim_hamming", "q_dsir", "q_ppl_band", "q_mix_temp", "q_tpch_q22",
      "q_tpch_q11", "q_tpch_q15", "q_kl_drift", "q_chi2", "q_bm25",
      "q_neg_sample", "q_ann_recall", "q_ann_recall_ivf", "q_ann_recall_trunc",
      "q_pmi", "q_ks_drift", "q_kmv_union", "q_skew_audit", "q_target_enc",
      "q_basket", "q_bins", "q_jaro", "q_bitmap", "q_psi", "q_quantile_norm",
      "q_twostage", "q_benford", "q_sample", "q_split", "q_calibration",
      "q_rrf", "q_hits", "q_textrank", "q_km", "q_range_plan",
      "q_modularity", "q_decompose", "q_ips", "q_mi",
      "q_heavy", // 1-row (sketch, N) scalar broadcast for support_guaranteed
      // q_ap: the 1-row (P, N) totals broadcast against the
      // distinct-score grid — the q_auc scalar shape
      // q_bootstrap: the 1-row CI verdict broadcast against the 1-row
      // overall mean — the q_sample interval-contract shape
      "q_ap", "q_bootstrap")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = plan(fn(spark, Sf0001))
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      if (!bnljByDesign(name))
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a BNLJ:\n$p")
    }
  }

  test("tpch q21: EXISTS/NOT-EXISTS plan as semi+anti on the order key, no cartesian") {
    val p = plan(graft.queries.TpchDeepQueries.qTpchQ21(spark, Sf0001))
    assert(p.contains("LeftSemi"), s"EXISTS did not plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not plan as an anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the supplier-inequality residual degraded the join:\n$p")
  }

  test("tpch q2: the per-part min-cost join broadcasts, supplies shuffles once") {
    val p = plan(graft.queries.TpchDeepQueries.qTpchQ2(spark, Sf0001))
    assert(p.contains("BroadcastHashJoin"), s"min-cost join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
  }

  test("DQ referential checks plan as broadcast anti joins (dim side small)") {
    import graft.ops.DataQuality._
    val li = Tables.table(spark, Sf0001, "lineitem")
    val p = plan(audit(li, Seq(
      Referential("l_partkey", Tables.table(spark, Sf0001, "part"), "p_partkey"))))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"referential check should broadcast-anti, got:\n$p")
  }

  test("incremental merge is one state-sized exchange (partial+final agg)") {
    import graft.ops.Incremental
    val ev = Tables.events(spark, Sf0001)
    val states = (0 to 1).map(i =>
      Incremental.partialState(
        ev.filter(col("event_id") % 2 === i), Seq("event_type"), "value"))
    val p = plan(Incremental.mergeStates(states, Seq("event_type")))
    // merge input is the union of two already-aggregated states; the
    // merge group-by itself gets partial+final around ONE exchange
    assert("HashAggregate".r.findAllIn(p).length >= 4, s"no partial agg:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("runtime bloom-filter join pruning injects on a selective join") {
    // thresholds floored so the tiny fixture qualifies; at real scale
    // the defaults (10M creation side) gate the same rewrite
    // creation side must be UNDER its threshold (sketch must be cheap),
    // application side OVER its own (pruning must be worth it) — floor
    // only the application-side bar so the tiny fixture qualifies
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // the rewrite targets SHUFFLE joins (broadcast already avoids the
      // big-side shuffle) — force the shuffle path on the tiny fixture
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables.table(spark, Sf0001, "orders")
        .filter(col("o_totalprice") > 400000) // selective build side
      val li = Tables.table(spark, Sf0001, "lineitem")
      val p = plan(li.join(orders, col("l_orderkey") === col("o_orderkey")))
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("corpus split/sample are narrow: no exchange anywhere in the plan") {
    val d = Tables.table(spark, Sf0001, "documents")
    val split = graft.ops.Corpus.hashSplit(d, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(!plan(split).contains("Exchange"), s"hashSplit shuffles:\n${plan(split)}")
    val sampled = graft.ops.Corpus.stratifiedSample(
      d, "lang", "doc_id", Map("en" -> 0.25), defaultRate = 0.75)
    assert(!plan(sampled).contains("Exchange"), "stratifiedSample shuffles")
    val mixed = graft.ops.Corpus.mix(d, "source", "doc_id", Map("src0" -> 2.5))
    assert(!plan(mixed).contains("Exchange"), "mix shuffles")
  }

  test("inverted index: window and groupBy share ONE exchange on token") {
    val d = Tables.table(spark, Sf0001, "documents")
    val idx = graft.ops.Corpus.invertedIndex(d, "doc_id", "text", 2, 10)
    val p = plan(idx)
    // tree lines only ("+- Exchange (n)"), not the "(n) Exchange" details
    val exchanges = p.linesIterator.count(_.contains("+- Exchange ("))
    assert(exchanges == 1, s"expected exactly 1 exchange, got $exchanges:\n$p")
  }

  test("packChunked with shardCol avoids the single-partition global window") {
    val d = Tables.table(spark, Sf0001, "documents")
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("shard", col("doc_id") % 8)
    val p = plan(graft.ops.Corpus.packChunked(d, "doc_id", "n_tokens", 128, Some("shard")))
    assert(p.contains("hashpartitioning(shard"), s"no per-shard partitioning:\n$p")
    assert(!p.contains("SinglePartition"), "sharded packing still plans a global window")
  }

  test("blocklist: suffix equi-join broadcasts the blocklist, no cartesian") {
    import spark.implicits._
    val urls = (1 to 100).map(i => (i, s"https://h$i.example$i.com/p")).toDF("id", "url")
    val p = plan(graft.ops.TextPrep.flagBlockedDomains(
      urls, "url", Seq("example7.com").toDF("domain")))
    assert(p.contains("BroadcastHashJoin"), s"blocklist not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"blocklist planned a product join:\n$p")
  }

  test("overlap sketch: signature aggregate is partial+final (map-side combined)") {
    val docs = Tables.table(spark, Sf0001, "documents")
    val p = plan(graft.ops.Corpus.sourceOverlapSketch(
      docs, "source", "text", n = 3, numHashes = 8))
    // the (src, i) min must pre-reduce map-side: partial + final around
    // one exchange — the property that makes the shuffle sources × k
    // instead of per-shingle
    assert(p.contains("HashAggregate"), s"no hash aggregate:\n$p")
    val aggCount = p.linesIterator.count(_.contains("HashAggregate"))
    assert(aggCount >= 2, s"expected partial+final aggregation:\n$p")
    assert(!p.contains("CartesianProduct"), s"sketch pair join degenerated:\n$p")
  }

  test("partitioned parquet layout prunes by partition key on read") {
    val dir = tmpDir("plan_part")
    Tables.events(spark, Sf0001)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-01")
    val p = plan(read)
    assert(p.contains("PartitionFilters: [isnotnull(day"), s"no partition pruning in:\n$p")
  }

  test("AQE splits a skewed join partition at runtime (no manual salt needed)") {
    // q_join_salted proves the MANUAL skew remedy; this proves the
    // automatic one — AQE's skew-join split — actually engages, i.e.
    // the conf the 100 TB story leans on is live, not assumed. Low
    // thresholds make the toy hot key trigger the same code path a
    // hot-key shuffle partition triggers at cluster scale.
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ).map(k => k -> scala.util.Try(conf.get(k)).toOption.flatMap(Option(_)))
      .toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // the payload must be DATA-DEPENDENT and high-entropy: a literal
      // pad constant-folds out of the exchange, and a repeated string
      // compresses away in the map output — either way no partition
      // ever looks big enough to split
      val left = spark.range(0, 120000)
        .select(when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
          concat(md5(col("id").cast("string")),
            md5((col("id") + lit(7)).cast("string"))).as("pad"))
      val right = spark.range(0, 2000)
        .select(col("id").as("k"), lit(1L).as("dim"))
      val joined = left.join(right, "k")
      // materialize THIS queryExecution (count() would plan its own)
      // so the adaptive plan finalizes with runtime stage statistics
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"AQE did not mark the hot-key join skewed:\n${p.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("boilerplate removal: df count is partial+final, reassembly keyed, no window") {
    val p = plan(graft.queries.PrepQueries.qBoilerplate(spark, Sf0001))
    // the chunk document-frequency count and the per-doc reassembly are
    // hash aggregates (map-side combinable); an ordered-window spelling
    // here would single-partition the corpus
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r
      .findAllIn(p).length >= 4, s"no partial aggregation in:\n$p")
    assert(!p.contains("Window"), s"boilerplate plan uses a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("adamic-adar: wedges are generated in-row (no self-join), top-k is TakeOrdered") {
    // the GATE returns an eagerly checkpointed frame (its plan is a
    // block scan by design — exit hygiene), so the shape assertions
    // run on the operator itself, adaptive cap included
    val edges = graft.ops.Graphs.coOccurrenceEdges(
      Tables.table(spark, Sf0001, "lineitem"), "l_orderkey", "l_partkey")
    val p = plan(graft.ops.Graphs.adamicAdarAdaptive(
      edges, capQuantile = 0.99, topK = 50))
    // r11 plan (VERDICT r10 task 1): the deg² hazard is handled by the
    // grouped adjacency — neighbor lists collected once per capped
    // center, ordered pairs emitted by codegen'd generates — so the
    // wedge stream must be born from Generate nodes, NOT from an
    // adjacency self-join (which shuffled + sorted the sym stream
    // twice); the only joins left are the deg attach and the known-edge
    // anti-join. The top-50 cut must plan as TakeOrdered, never a
    // global sort of all candidate pairs.
    assert(p.contains("TakeOrderedAndProject"), s"top-k is a global sort:\n$p")
    assert("(?i)generate".r.findAllIn(p).nonEmpty,
      s"in-row wedge generation missing (self-join regression?):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedge join degraded:\n$p")
  }

  test("average precision: every window is bucket-partitioned (no global window)") {
    val p = plan(graft.queries.EvalQueries.qAp(spark, Sf0001))
    // the q_auc discipline: cumulatives decompose into per-bucket
    // windows + a bucket-count-sized offset window; no window may run
    // over the unbucketed score grid
    val windows = p.linesIterator.filter(_.contains("Window")).toList
    assert(windows.nonEmpty, s"expected windows in:\n$p")
    // the only single-partition window is over the ~500-row bucket
    // table (one row per floor(score)); the grid window partitions by
    // _bkt — assert the grid-sized sort carries the partition key
    assert(p.contains("_bkt"), s"bucket decomposition missing:\n$p")
  }

  test("attribution: one user-keyed exchange feeds all journey windows") {
    val p = plan(graft.queries.EvalQueries.qAttribution(spark, Sf0001))
    // journey cut + first/last ranks + touch counts all partition by
    // the user (and journey) key — hashpartitioning on _u must appear,
    // and no partition-less window may exist
    assert(p.contains("hashpartitioning(_u"), s"no user-keyed exchange in:\n$p")
    assert(!p.contains("SinglePartition, Window") &&
      !p.contains("Window [") || p.contains("hashpartitioning"),
      s"unpartitioned window in:\n$p")
  }
}
