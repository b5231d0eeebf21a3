package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SimHash64

/** Deduplication operators for LLM training-data pipelines (SURVEY.md
  * §7.4): exact content-hash dedup, deterministic MinHash + LSH banding
  * for near-dup candidate generation, n-gram Jaccard verification, and
  * SimHash fingerprints.
  *
  * Scale design (100 TB posture):
  *  - every stage keys on a digest/band hash, so the only shuffles are
  *    hash-partitioned group-bys/joins on uniformly distributed keys (md5
  *    output — no skew by construction);
  *  - signatures are narrow per-row projections (codegen'd higher-order
  *    functions, no UDF);
  *  - the LSH self-join never compares all pairs — candidates are
  *    generated per band bucket, and only candidates get the exact
  *    Jaccard verification.
  */
object Dedup {

  /** Exact dedup on a normalization of the text: group by content hash,
    * keep the minimum id as representative. `keyExpr` defaults to the
    * raw text hash; pass e.g. [[wordSetKey]] to collapse token-permuted
    * copies.
    */
  def exactDuplicates(
      df: DataFrame,
      idCol: String,
      key: Column,
  ): DataFrame =
    df.groupBy(key.as("content_key"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("copies"),
      )

  /** sha256 of the raw text — byte-exact duplicate key. */
  def textKey(text: Column): Column = sha2(text, 256)

  /** md5 over the sorted distinct token set — catches shuffled/reordered
    * copies of the same bag of words.
    */
  def wordSetKey(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Deterministic k-permutation MinHash signature over distinct
    * shingles: `sig[i] = min_s md5(s || '#' || i)`.
    *
    * md5-as-permutation keeps the signature reproducible across engines
    * and runs (no RNG seeds to persist) — the property the correctness
    * oracle needs and a production pipeline wants for incremental dedup.
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(
        transform(shingles, s => md5(concat(s, lit("#"), i.cast("string"))))))

  /** LSH banding: hash `rows` consecutive signature values per band.
    * Docs sharing any band hash are near-dup candidates.
    * Returns (band_idx, band_hash) pairs as an array of structs ready to
    * explode.
    */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      val joined =
        concat((0 until rows).map(r => sig.getItem(b * rows + r)): _*)
      struct(lit(b).as("band_idx"), md5(joined).as("band_hash"))
    }: _*)

  /** Near-dup candidate pairs via MinHash-LSH: signature → bands →
    * explode → self-join per (band_idx, band_hash) bucket → distinct
    * (a < b) pairs. The self-join shuffles on the band hash (uniform),
    * never materializing the full pair matrix.
    */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      bands: Int = 4,
  ): DataFrame = {
    require(k % bands == 0, "k must divide evenly into bands")
    val rows = k / bands
    val toks = TextAnalysis.tokens(col(textCol))
    val sh = TextAnalysis.shingles(toks, 3)
    val banded = df
      .filter(size(TextAnalysis.tokens(col(textCol))) >= 3)
      .withColumn("sig", minhashSignature(sh, k))
      .select(col(idCol), explode(bandHashes(col("sig"), bands, rows)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
    val a = banded.toDF(s"a_$idCol", "band_idx", "band_hash")
    val b = banded.toDF(s"b_$idCol", "band_idx", "band_hash")
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .select(col(s"a_$idCol").as("doc_a"), col(s"b_$idCol").as("doc_b"))
      .distinct()
  }

  /** Exact token-set Jaccard similarity between two token arrays —
    * integer set sizes, one double division (deterministic).
    */
  def jaccard(a: Column, b: Column): Column = {
    val ad = array_distinct(a)
    val bd = array_distinct(b)
    size(array_intersect(ad, bd)).cast("double") /
      size(array_union(ad, bd)).cast("double")
  }

  /** LSH candidates verified with exact Jaccard ≥ threshold: the full
    * near-dup pipeline (shingle → minhash → band → bucket join → verify).
    */
  def nearDuplicatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.8,
      k: Int = 8,
      bands: Int = 4,
  ): DataFrame = {
    val cand = lshCandidatePairs(df, idCol, textCol, k, bands)
    val toks = df.select(
      col(idCol),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    cand
      .join(toks.toDF("doc_a", "toks_a"), "doc_a")
      .join(toks.toDF("doc_b", "toks_b"), "doc_b")
      .withColumn("jac", jaccard(col("toks_a"), col("toks_b")))
      .filter(col("jac") >= threshold)
      .select("doc_a", "doc_b", "jac")
  }

  /** SimHash fingerprint per document (custom Catalyst expression,
    * codegen'd); near-dups have small Hamming distance.
    */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      SimHash64.simhash64(TextAnalysis.tokens(col(textCol))).as("simhash"))
}
