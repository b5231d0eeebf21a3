package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Data-selection semantics on crafted fixtures: DSIR ranks
  * target-like raw docs above target-unlike ones and is partition-
  * invariant; perplexity bands are tertile-sized with the high-
  * surprisal tail dropped and honor explicit production cuts;
  * temperature mixing interpolates between natural (α=1) and uniform
  * (α=0) allocations with rates capped at 1.
  */
class SelectionSpec extends SparkTestBase {

  import spark.implicits._

  // target speaks apples/oranges; raw pool: doc 100 target-like,
  // doc 101 mixed, doc 102 pure noise vocabulary
  private def dsirFixture = Seq(
    (1L, "apple orange apple pear orange apple", true),
    (2L, "orange apple pear apple orange pear", true),
    (3L, "apple pear orange orange apple pear", true),
    (100L, "apple orange pear apple orange apple", false),
    (101L, "apple noise1 orange noise2 pear noise3", false),
    (102L, "noise1 noise2 noise3 noise4 noise5 noise6", false),
  ).toDF("doc_id", "text", "tgt")

  test("dsirScores: target-like raw docs outscore noise docs, target rows excluded") {
    val scored = Selection.dsirScores(dsirFixture, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.keySet == Set(100L, 101L, 102L)) // raw pool only
    assert(scored(100L) > scored(101L))
    assert(scored(101L) > scored(102L))
  }

  test("dsirScores: partition-invariant (1 vs 7 partitions, identical rows)") {
    val a = Selection.dsirScores(dsirFixture.coalesce(1), "doc_id", "text", col("tgt"))
      .orderBy("doc_id").collect().toSeq
    val b = Selection.dsirScores(dsirFixture.repartition(7), "doc_id", "text", col("tgt"))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("dsirSelect: returns exactly k highest-score docs") {
    val top = Selection.dsirSelect(dsirFixture, "doc_id", "text", col("tgt"), k = 2)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(100L, 101L))
  }

  private def bandFixture = (1L to 90L)
    // surprisal varies continuously with i: doc i mixes a common-bigram
    // run (length 91−i) with i doc-unique tokens, so per-doc means are
    // (near-)distinct — tertile cuts on heavily tied values degenerate
    // by design (ties share a band), which is not what this asserts
    .map { i =>
      val words = Seq.fill((91 - i).toInt)("rep") ++
        (1L to i).map(j => s"u${i}_$j")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")

  test("perplexityBands: tertile-sized bands, tail = highest surprisal, keep drops tail") {
    val out = Selection.perplexityBands(bandFixture, "doc_id", "text").cache()
    val sizes = out.groupBy("band").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum == 90L)
    assert(sizes.size == 3 && sizes.forall { case (_, n) => n >= 20 && n <= 45 },
      sizes)
    val maxKept = out.filter(col("keep") === 1).agg(max("mean_surprisal"))
      .head().getDouble(0)
    val minTail = out.filter(col("band") === "tail").agg(min("mean_surprisal"))
      .head().getDouble(0)
    assert(maxKept <= minTail)
    out.unpersist()
  }

  test("perplexityBands: explicit production cuts bypass the quantile pass") {
    val out = Selection.perplexityBands(bandFixture, "doc_id", "text",
      cuts = Some((0.0, Double.MaxValue)))
    // t1=0 → nothing in head except exact zeros; t2=∞ → no tail
    assert(out.filter(col("band") === "tail").count() == 0)
    assert(out.filter(col("keep") === 0).count() == 0)
  }

  private def mixFixture = (1L to 1000L)
    .map { i =>
      val src = if (i <= 640) "big" else if (i <= 960) "mid" else "small"
      (i, src, 100L)
    }.toDF("doc_id", "source", "n_chars")

  test("temperatureMix: α=1 preserves natural proportions, α=0.5 lifts the tail") {
    def rates(alpha: Double): Map[String, Double] =
      Selection.temperatureMix(mixFixture, "source", "doc_id", "n_chars",
          targetDocs = 200, alpha = alpha)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val natural = rates(1.0)
    // α=1: mass ∝ docs (uniform 100 chars each) → equal per-doc rates
    assert(math.abs(natural("big") - natural("small")) < 1e-6, natural)
    val temp = rates(0.5)
    // α<1: small sources get a HIGHER per-doc admission rate
    assert(temp("small") > temp("big"), temp)
  }

  test("temperatureMix: rates cap at 1.0 and n_kept is the hash-exact draw") {
    val out = Selection.temperatureMix(mixFixture, "source", "doc_id", "n_chars",
        targetDocs = 5000, alpha = 0.5) // target far above corpus size
      .collect()
    out.foreach { r =>
      assert(r.getDouble(3) == 1.0) // rate capped
      assert(r.getLong(4) == r.getLong(1)) // everything kept
    }
  }

  test("temperatureMix: expected selected size lands near targetDocs") {
    val kept = Selection.temperatureMix(mixFixture, "source", "doc_id", "n_chars",
        targetDocs = 200, alpha = 0.5)
      .agg(sum("n_kept")).head().getLong(0)
    assert(kept >= 150 && kept <= 250, s"kept=$kept") // md5-binomial spread
  }
}
