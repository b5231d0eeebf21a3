package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Corpus-assembly semantics on crafted fixtures: hash-bucket parity
  * with a reference md5 computation, split fraction sanity + partition
  * invariance, stratified-rate subset behavior, mixing copy counts,
  * both packing semantics (chunk: offsets advance mod capacity;
  * greedy: capacity never exceeded, every doc packed exactly once),
  * inverted-index df/posting caps.
  */
class CorpusSpec extends SparkTestBase {

  import spark.implicits._

  private def docsFixture = (1L to 400L)
    .map(i => (i, (1 to (i % 7 + 1).toInt).map(j => s"tok${(i + j) % 13}").mkString(" ")))
    .toDF("doc_id", "text")

  test("hashBucket matches a driver-side md5 reference computation") {
    val got = spark.range(1, 50)
      .select(col("id"), Corpus.hashBucket(col("id"), "split", 10000).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ref(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"split$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 10000
    }
    (1L until 50L).foreach(i => assert(got(i) == ref(i), s"id=$i"))
  }

  test("negativeSample: exactly k per anchor, never same-group, partition-invariant") {
    val df = (1L to 300L).map(i => (i, s"src${i % 5}")).toDF("doc_id", "source")
    val out = Corpus.negativeSample(df, "doc_id", "source", k = 5, poolSize = 32)
    // every anchor gets exactly k: the pool is uniform over 5 groups, so
    // each anchor sees ~4/5 × 32 ≈ 25 eligible candidates ≫ 5
    val perAnchor = out.groupBy("doc_id").count().collect()
    assert(perAnchor.length == 300)
    assert(perAnchor.forall(_.getLong(1) == 5L))
    // a negative never shares the anchor's group
    val joined = out
      .join(df.withColumnRenamed("doc_id", "neg_id")
        .withColumnRenamed("source", "neg_source"), "neg_id")
      .join(df, "doc_id")
    assert(joined.filter(col("source") === col("neg_source")).count() == 0)
    // identical draw under a different physical partitioning
    val re = Corpus.negativeSample(df.repartition(7), "doc_id", "source",
      k = 5, poolSize = 32)
    assert(out.exceptAll(re).isEmpty && re.exceptAll(out).isEmpty)
  }

  test("tokenBudget: prefix property, budget respected, partition-invariant") {
    val df = (1L to 500L).map(i => (i, (i % 37 + 1))).toDF("doc_id", "n_tok")
    val total = df.agg(sum("n_tok")).head().getLong(0)
    val cut = Corpus.tokenBudget(df, "doc_id", "n_tok", budget = total / 2)
    // running total never exceeds the budget
    assert(cut.agg(max("cum_tokens")).head().getLong(0) <= total / 2)
    // maximal: the cut + any one more doc would exceed (cut size <
    // corpus, so at least one doc was excluded by budget, not absence)
    val cutIds = cut.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cutIds.size < 500)
    // nested: half the budget selects a strict subset
    val smaller = Corpus.tokenBudget(df, "doc_id", "n_tok", budget = total / 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(cutIds) && smaller.size < cutIds.size)
    // physical layout cannot move the cut
    val re = Corpus.tokenBudget(df.repartition(7), "doc_id", "n_tok",
      budget = total / 2)
    assert(cut.exceptAll(re).isEmpty && re.exceptAll(cut).isEmpty)
    // agrees with a driver-side single-threaded reference
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val ref = (1L to 500L).map(i => (md5hex(s"budget$i"), i, i % 37 + 1))
      .sortBy(t => (t._1, t._2))
      .scanLeft(("", 0L, 0L)) { case ((_, _, cum), (h, id, t)) => (h, id, cum + t) }
      .drop(1).takeWhile(_._3 <= total / 2).map(_._2).toSet
    assert(cutIds == ref)
  }

  test("hashSplit: fractions approximately honored, assignment partition-invariant") {
    val df = spark.range(0, 10000).toDF("doc_id")
    val splits = Corpus.hashSplit(df, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.values.sum == 10000)
    assert(math.abs(splits("train") - 8000) < 200)
    assert(math.abs(splits("val") - 1000) < 120)
    assert(math.abs(splits("test") - 1000) < 120)
    // same rows, radically different partitioning → identical assignment
    val a = Corpus.hashSplit(df.repartition(17), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val b = Corpus.hashSplit(df.coalesce(1), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("stratifiedSample: rate-1 strata kept whole, sampled stratum is a stable subset") {
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val kept = Corpus.stratifiedSample(df, "lang", "doc_id", Map("en" -> 0.25, "zh" -> 1.0))
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("zh") == 500) // rate 1.0 ⇒ exact passthrough
    assert(byLang("en") > 60 && byLang("en") < 190) // ≈ 125
    // determinism: rerun selects the same rows
    val again = Corpus.stratifiedSample(df, "lang", "doc_id", Map("en" -> 0.25, "zh" -> 1.0))
    assert(kept.exceptAll(again).isEmpty)
    // monotone: a higher rate strictly contains a lower one
    val more = Corpus.stratifiedSample(df, "lang", "doc_id", Map("en" -> 0.5, "zh" -> 1.0))
    assert(kept.exceptAll(more).isEmpty)
  }

  test("mix: integer weights copy exactly, fractional in expectation, zero drops") {
    val df = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val mixed = Corpus.mix(df, "source", "doc_id",
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 0.0))
    val n = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("src0") == 200) // exactly 2 copies each of 100 docs
    assert(n("src1") > 20 && n("src1") < 80) // ≈ 50
    assert(!n.contains("src2")) // weight 0 ⇒ dropped
    // copy_idx enumerates copies 0..k-1 per doc
    val idx = mixed.filter(col("source") === "src0")
      .groupBy("doc_id").agg(collect_set("copy_idx").as("s"))
      .select(min(size(col("s"))).as("mn"), max(size(col("s"))).as("mx"))
      .head()
    assert(idx.getInt(0) == 2 && idx.getInt(1) == 2)
  }

  test("packChunked: offsets advance by token count mod capacity, packs cut at capacity") {
    val df = Seq((1L, 100), (2L, 50), (3L, 10), (4L, 200), (5L, 1))
      .toDF("doc_id", "n_tokens")
    val out = Corpus.packChunked(df, "doc_id", "n_tokens", capacity = 128)
      .orderBy("doc_id")
      .select("pack_id", "begin_offset").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    // cum-before: 0, 100, 150, 160, 360
    assert(out == Seq((0L, 0), (0L, 100), (1L, 22), (1L, 32), (2L, 104)))
  }

  test("packChunked with shardCol scopes order and pack ids per shard") {
    val df = Seq(("a", 1L, 100), ("a", 2L, 100), ("b", 3L, 100))
      .toDF("shard", "doc_id", "n_tokens")
    val out = Corpus.packChunked(df, "doc_id", "n_tokens", 128, Some("shard"))
      .select("shard", "doc_id", "pack_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 1L, 0L), ("a", 2L, 0L), ("b", 3L, 0L)))
  }

  test("packGreedy: bins never exceed capacity, every doc packed once, no doc split") {
    val df = (1L to 500L).map(i => (i, (i % 60 + 1).toInt)).toDF("doc_id", "n_tokens")
    val out = Corpus.packGreedy(df, "doc_id", "n_tokens", capacity = 100, partitions = 8)
    assert(out.count() == 500) // every doc exactly once
    assert(out.select(countDistinct("doc_id")).head().getLong(0) == 500)
    val maxUsed = out.groupBy("pack_id").agg(sum("n_tokens").as("tot"))
      .select(max("tot")).head().getLong(0)
    assert(maxUsed <= 100)
    // oversized doc gets its own bin rather than being dropped
    val big = Seq((1L, 50), (2L, 999), (3L, 50)).toDF("doc_id", "n_tokens")
    val bigOut = Corpus.packGreedy(big, "doc_id", "n_tokens", 100, 2)
    assert(bigOut.count() == 3)
    val soloBin = bigOut.filter(col("n_tokens") === 999).select("pack_id").head().getLong(0)
    assert(bigOut.filter(col("pack_id") === soloBin).count() == 1)
  }

  test("invertedIndex: df counts documents not occurrences; postings sorted+capped") {
    val df = Seq(
      (3L, "apple apple banana"),
      (1L, "apple cherry"),
      (2L, "apple  banana"), // double space → empty token filtered
    ).toDF("doc_id", "text")
    val out = Corpus.invertedIndex(df, "doc_id", "text", minDf = 2, maxPostings = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(out("apple") == (3L, Seq(1L, 2L))) // df true count, postings capped at 2
    assert(out("banana") == (2L, Seq(2L, 3L)))
    assert(!out.contains("cherry")) // df 1 < minDf
    assert(!out.contains(""))
  }

  test("sampleK: exact size, deterministic, nested under growing k, plans TakeOrdered") {
    val df = spark.range(0, 5000).toDF("doc_id")
    val s100 = Corpus.sampleK(df, "doc_id", 100)
    assert(s100.count() == 100)
    // deterministic across partitionings
    val again = Corpus.sampleK(df.repartition(13), "doc_id", 100)
    assert(s100.exceptAll(again).isEmpty)
    // nested: top-100 ⊂ top-250
    val s250 = Corpus.sampleK(df, "doc_id", 250)
    assert(s100.exceptAll(s250).isEmpty)
    // scale shape: top-k merge, not a global sort
    val plan = s100.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(400))
  }

  test("contamination: shared shingles found, hot shingles excluded, overlap exact") {
    val train = Seq(
      (10L, "the quick brown fox jumps over dogs"), // shares "quick brown fox" run with eval 1
      (11L, "quick brown fox jumps high today"),
      (12L, "completely unrelated text about planes"),
      (13L, "common filler common filler common filler"), // hot-shingle source
      (14L, "common filler common filler common filler"),
      (15L, "common filler common filler common filler"),
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (1L, "the quick brown fox jumps"), // shingles: 3 of them
      (2L, "common filler common filler"), // only hot shingles → no rows
      (3L, "nothing in common here at all"),
    ).toDF("doc_id", "text")
    val out = Corpus.contamination(train, eval_, "doc_id", "text",
        n = 3, minCommon = 2, maxShingleDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // eval 1 = shingles {the quick brown, quick brown fox, brown fox jumps};
    // train 10 shares all 3, train 11 shares 2
    assert(out((1L, 10L)) == (3L, 3L, 1.0))
    assert(out((1L, 11L))._1 == 2L)
    // "common filler common" appears in 3 train docs > cap 2 → excluded,
    // and eval 2's remaining matches fall under minCommon
    assert(!out.keys.exists(_._1 == 2L))
    assert(!out.keys.exists(_._1 == 3L))
  }

  test("curate: kept docs pass both gates, survivors unique per key, split total") {
    val docs = graft.sources.Tables.table(spark, Sf0001, "documents")
    val out = Corpus.curate(docs, "doc_id", "text").cache()
    assert(out.count() > 0)
    // survivors = min kept doc per word-set key, computed independently
    val toks = TextAnalysis.tokens(col("text"))
    val kept = docs.select(col("doc_id"),
      TextAnalysis.langPredict(TextAnalysis.langHits(toks)).as("lp"),
      Dedup.wordSetKey(toks).as("k"))
      .join(TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
        .select("doc_id", "keep"), Seq("doc_id"))
      .filter(col("keep") === 1 && col("lp") === "en")
    val expect = kept.groupBy("k").agg(min("doc_id").as("doc_id")).select("doc_id")
    assert(out.select("doc_id").except(expect).isEmpty)
    assert(expect.except(out.select("doc_id")).isEmpty)
    // every row carries a valid split; all three appear at corpus size
    assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0)
    out.unpersist()
  }

  test("invertedIndex over a 400-doc fixture: df floor respected") {
    val out = Corpus.invertedIndex(docsFixture, "doc_id", "text", minDf = 30, maxPostings = 5)
    val mn = out.select(min("df")).head().getLong(0)
    assert(mn >= 30)
    assert(out.select(max(size(col("postings")))).head().getInt(0) <= 5)
  }

  test("sourceQuota: agrees row-for-row with the window spelling, ties to smaller id") {
    import org.apache.spark.sql.expressions.Window
    // scores collide constantly (i % 5) so the id tiebreak is exercised
    val df = (1L to 300L).map(i => (s"s${i % 4}", i, (i % 5).toDouble))
      .toDF("source", "doc_id", "score")
    val got = Corpus.sourceQuota(df, "source", "doc_id", "score", cap = 10)
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id"))
    val want = df
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // strata smaller than the cap are kept whole
    val tiny = Seq(("a", 1L, 1.0), ("a", 2L, 2.0)).toDF("source", "doc_id", "score")
    assert(Corpus.sourceQuota(tiny, "source", "doc_id", "score", 10).count() == 2)
  }

  test("quantizeInt8: codes in [0,255], error bounded by scale/2, constants exact") {
    val vecs = Seq(
      (1L, Array(0.1f, -0.5f, 0.9f, 0.3f)),
      (2L, Array(7.0f, 7.0f, 7.0f)), // constant vector: sc == 0 branch
      (3L, Array(-1e-4f, 1e-4f, 0f))).toDF("vec_id", "embedding")
    val audit = Quantization.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    val (mn1, mx1, sum1, err1) = audit(1L)
    assert(mn1 == -0.5f.toDouble && mx1 == 0.9f.toDouble)
    assert(err1 <= (mx1 - mn1) / 255.0 / 2.0 + 1e-6)
    assert(sum1 >= 0 && sum1 <= 4L * 255)
    val (_, _, sum2, err2) = audit(2L)
    assert(sum2 == 0 && err2 == 0.0) // constant vector: all-zero codes, zero error
    // code frame: min/max code hit 0 and 255, codes decode within the bound
    val q = Quantization.quantizeVectors(vecs, "vec_id", "embedding")
      .filter(col("vec_id") === 1L)
      .select(explode(col("codes")).as("c")).agg(min("c"), max("c")).head()
    assert(q.getShort(0) == 0 && q.getShort(1) == 255)
  }

  test("shardForTraining: partition-invariant, dense pos, hash-balanced") {
    val df = (1L to 4000L).toDF("doc_id")
    val a = Corpus.shardForTraining(df.repartition(17), "doc_id", nShards = 8)
    val b = Corpus.shardForTraining(df.coalesce(1), "doc_id", nShards = 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "assignment must not depend on physical partitioning")
    // pos is dense 1..size within every shard
    val dense = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(dense.isEmpty, "pos must be dense per shard")
    // hash-uniform: 4000 rows over 8 shards — each within ±4σ of 500
    val sizes = a.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8)
    val sigma = math.sqrt(4000.0 * (1.0 / 8) * (7.0 / 8)) // ~21
    sizes.foreach(n =>
      assert(math.abs(n - 500.0) < 4 * sigma, s"shard size $n vs expected 500"))
  }

  test("quantizeBinary: bit layout, word count, hamming, topK ranking") {
    // dims 0..3 signs +,-,+,- → bits 0 and 2 set → word 0b0101 = 5
    val vecs = Seq(
      (1L, Array(1.0f, -1.0f, 0.0f, -0.5f)),
      (2L, Array.fill(4)(-1.0f)),
      (3L, (0 until 33).map(i => if (i == 32) 1.0f else -1.0f).toArray))
      .toDF("vec_id", "embedding")
    val packed = Quantization.quantizeBinary(vecs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(packed(1L) == Seq(5L)) // 0.0f counts as non-negative
    assert(packed(2L) == Seq(0L))
    assert(packed(3L) == Seq(0L, 1L)) // ceil(33/32)=2 words; dim 32 → word 1 bit 0
    // hamming(5, 0) = popcount(101b) = 2; identical vectors → 0
    val hd = Seq((Seq(5L), Seq(0L)), (Seq(5L), Seq(5L)))
      .toDF("a", "b")
      .select(Quantization.hamming(col("a"), col("b")).as("hd"))
      .collect().map(_.getLong(0)).toSeq
    assert(hd == Seq(2L, 0L))
    // topK: self-match ranks first at distance 0, k bounds the output
    // (corpus restricted to the 4-dim vectors — word counts must agree)
    val sameDim = Quantization.quantizeBinary(
      vecs.filter(col("vec_id") < 3L), "vec_id", "embedding")
    val q = sameDim.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("qid"), col("words").as("qw"))
    val c = sameDim.select(col("vec_id").as("cid"), col("words").as("cw"))
    val top = Quantization.hammingTopK(q, c, k = 2)
      .orderBy("rank").collect()
    assert(top.length == 2)
    assert(top(0).getAs[Long]("cid") == 1L && top(0).getAs[Long]("hd") == 0L)
    assert(top(0).getAs[Int]("rank") == 1)
  }

  test("sampleWeighted: partition-invariant, biased toward heavy weights") {
    val df = (1L to 2000L).map(i => (i, if (i % 10 == 0) 100.0 else 1.0))
      .toDF("doc_id", "w")
    val a = Corpus.sampleWeighted(df.repartition(13), "doc_id", "w", k = 200)
    val b = Corpus.sampleWeighted(df.coalesce(1), "doc_id", "w", k = 200)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // 10% of rows carry 100x weight; an unweighted 200-sample would
    // include ~20 of them, the weighted one should include far more
    val heavy = a.filter(col("w") === 100.0).count()
    assert(heavy > 100, s"heavy rows undersampled: $heavy of 200")
    // top-k by key, not a global sort: per-partition heaps + driver merge
    val p = a.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrdered plan:\n$p")
  }

  test("sampleWeighted: non-positive and null weights never selected") {
    // weight 0 would key to -ln(u)/0 = +Inf and a NEGATIVE weight to a
    // key that always wins — both are excluded by the documented
    // strictly-positive contract (A-ES gives weight<=0 inclusion
    // probability 0 anyway)
    val df = Seq((1L, 1.0), (2L, -5.0), (3L, 0.0), (5L, 2.0))
      .toDF("doc_id", "w")
      .unionByName(Seq((4L, Option.empty[Double])).toDF("doc_id", "w"))
    val got = Corpus.sampleWeighted(df, "doc_id", "w", k = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 5L), s"got $got")
  }

  test("hashSplit keyed on a group column: no group straddles two splits") {
    val df = (1L to 500L).map(i => (i, s"site${i % 23}")).toDF("doc_id", "source")
    val out = Corpus.hashSplit(df, "source",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "gsplit")
    val perGroup = out.groupBy("source")
      .agg(countDistinct(col("split")).as("k"))
      .agg(max("k")).head().getLong(0)
    assert(perGroup == 1L, "a source appeared in more than one split")
    assert(out.count() == 500)
  }

  test("sourceOverlap: hand-computed Jaccard; disjoint pairs omitted") {
    val docs = Seq(
      ("A", "a b c d"), // shingles {a b c, b c d}
      ("B", "a b c e"), // shingles {a b c, b c e} → A∩B = 1, J = 1/3
      ("C", "x y z w"), // disjoint from both
    ).toDF("source", "text")
    val got = Corpus.sourceOverlap(docs, "source", "text", n = 3).collect()
    assert(got.length == 1, "only the intersecting pair should appear")
    val r = got.head
    assert((r.getString(0), r.getString(1)) == ("A", "B"))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 2L, 2L)))
    assert(r.getDouble(5) == 0.333333) // r6(1/3)
    // set semantics: repeating a shingle inside one source changes nothing
    val rep = docs.unionByName(Seq(("A", "a b c d")).toDF("source", "text"))
    val again = Corpus.sourceOverlap(rep, "source", "text", n = 3).collect().head
    assert(again.getLong(2) == 1L && again.getLong(3) == 2L)
  }

  test("sourceOverlapSketch: deterministic, in [0,1], tracks exact overlap") {
    val docs = Seq(
      ("A", "a b c d"), // J(A,B) = 1/3 exactly
      ("B", "a b c e"),
      ("C", "x y z w"),
    ).toDF("source", "text")
    def run() = Corpus.sourceOverlapSketch(docs, "source", "text",
        n = 3, numHashes = 64)
      .orderBy("src_a", "src_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val est = run().toSeq
    assert(est == run().toSeq) // md5-deterministic, partitioning-free
    // all pairs appear (sketch has no intersection pre-filter): 3 pairs
    assert(est.map(t => (t._1, t._2))
      == Seq(("A", "B"), ("A", "C"), ("B", "C")))
    est.foreach { case (_, _, j) => assert(j >= 0.0 && j <= 1.0) }
    val ab = est.find(t => t._1 == "A" && t._2 == "B").get._3
    assert(math.abs(ab - 1.0 / 3.0) <= 0.2, s"est_jaccard(A,B)=$ab") // 3σ at k=64
    // disjoint pairs estimate at (or very near) zero
    assert(est.filter(t => t._2 == "C" || t._1 == "C").forall(_._3 <= 0.1))
  }

  test("noveltyScores: 0 for a duplicated doc, 1 for a unique one, short docs excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"), // identical to doc 2 → every shingle shared
      (2L, "a b c d e"),
      (3L, "p q r s"),   // entirely corpus-unique shingles
      (4L, "x y"),       // < 3 tokens: no shingles, excluded
    ).toDF("doc_id", "text")
    val out = Corpus.noveltyScores(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L), out.keySet.toString)
    assert(out(1L) == ((3L, 0L, 0.0)), out(1L).toString)
    assert(out(2L) == ((3L, 0L, 0.0)))
    assert(out(3L) == ((2L, 2L, 1.0)), out(3L).toString)
  }
}
