package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Det.r6

/** Embedding quantization — the storage/bandwidth half of similarity
  * search at corpus scale. A 100 TB float32 vector store is 25 TB as
  * uint8 codes: per-vector affine (min/max) quantization is the
  * standard first step (faiss's ScalarQuantizer, Milvus SQ8), cutting
  * scan I/O 4× for a bounded, per-vector-auditable reconstruction
  * error, with no trained codebook to version.
  *
  * Everything is a narrow per-row projection over array HOFs
  * (`transform`/`aggregate`/`zip_with` — codegen'd, no UDFs), so the
  * operator fuses into whatever scan precedes it; there is no shuffle
  * at any scale. Determinism: code assignment is spelled
  * `floor(x + 0.5)` clamped to 255 — pure correctly-rounded IEEE ops,
  * bit-identical across engines (Spark's `round` and DuckDB's `round`
  * disagree near ties; this spelling cannot).
  */
object Quantization {

  /** Per-vector affine uint8 quantization of a float-array column.
    * Emits the quantization audit frame: the affine params (`mn`, `mx`),
    * an exact BIGINT checksum of the codes (`code_sum` — the
    * cross-engine witness that every one of the 8-bit codes matches),
    * and the worst-element reconstruction error `max_err` (≤ scale/2 by
    * construction; 6-dp rounded). Constant vectors (mx == mn) get code
    * 0 everywhere and zero error.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val base = df.select(
      col(idCol),
      col(vecCol).as("_v"),
      array_min(col(vecCol)).cast("double").as("mn"),
      array_max(col(vecCol)).cast("double").as("mx"))
      .withColumn("_scale", (col("mx") - col("mn")) / lit(255.0))
    val codes = when(col("_scale") === 0.0,
      transform(col("_v"), _ => lit(0L)))
      .otherwise(transform(col("_v"), x =>
        least(floor((x.cast("double") - col("mn")) / col("_scale") + lit(0.5)),
          lit(255.0)).cast("long")))
    base.withColumn("_codes", codes)
      .select(
        col(idCol), col("mn"), col("mx"),
        aggregate(col("_codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        r6(aggregate(
          zip_with(col("_codes"), col("_v"), (c, x) =>
            abs(col("mn") + c.cast("double") * col("_scale") - x.cast("double"))),
          lit(0.0), (a, e) => greatest(a, e))).as("max_err"))
  }

  /** The quantized vectors themselves: (id, mn, scale, codes) — what a
    * real pipeline persists (codes as array<smallint>: parquet has no
    * unsigned byte, and int8 would need a −128 offset that buys
    * nothing after compression). Decode is `mn + code * scale`.
    */
  def quantizeVectors(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val base = df.select(col(idCol), col(vecCol).as("_v"),
      array_min(col(vecCol)).cast("double").as("mn"),
      array_max(col(vecCol)).cast("double").as("mx"))
      .withColumn("scale", (col("mx") - col("mn")) / lit(255.0))
    base.select(
      col(idCol), col("mn"), col("scale"),
      when(col("scale") === 0.0, transform(col("_v"), _ => lit(0).cast("short")))
        .otherwise(transform(col("_v"), x =>
          least(floor((x.cast("double") - col("mn")) / col("scale") + lit(0.5)),
            lit(255.0)).cast("short"))).as("codes"))
  }
}
