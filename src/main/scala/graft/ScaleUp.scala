package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Sessions

/** Synthetic scale-up of a testdata snapshot for load testing:
  * `runMain graft.ScaleUp <srcDir> <dstDir> <factor>` writes a
  * `factor`×-larger copy of every table, preserving schema, key
  * integrity, and join fanout — the dbgen-style tool for putting a
  * second point on the scale curve (SCALE.md) when only one driver
  * scale factor exists.
  *
  * Design rules, per table family:
  *
  *  - **Dimensions** (`region`, `nation`) copy unchanged — real stars
  *    grow facts, not geography.
  *  - **Keyed tables** replicate via a broadcast `range(factor)` cross
  *    join with every key domain offset by `copy × stride` (stride =
  *    max(key)+1 read from the PARENT table), so per-copy key spaces
  *    are disjoint and parent/child offsets agree: each copy's orders
  *    point at that copy's customers, per-key join fanout is exactly
  *    the source's, and group-by cardinalities scale linearly.
  *  - **documents** additionally rename the vocabulary per copy (word →
  *    word+copyDigit, sources suffixed too): a verbatim ×10 replica
  *    would make every document a 10-way near-duplicate and inflate
  *    LSH/minhash candidate density ~45× — quadratic in copies, nothing
  *    like a real corpus at 10× scale. Disjoint per-copy vocabularies
  *    keep band buckets copy-local, so dedup/similarity candidates
  *    scale linearly, which is the behavior being measured. Copy 0 is
  *    byte-identical to the source.
  *  - **embeddings** jitter each component with deterministic
  *    hash-derived noise (±0.05): LSH/IVF cell occupancy grows 10× with
  *    fresh points rather than 10 exact copies of each point.
  *
  * Determinism: no RNG anywhere — offsets are arithmetic, noise is
  * `xxhash64(id, copy, dim)` — so two runs produce identical bytes
  * modulo parquet row-group layout.
  *
  * This is NOT the driver's generator: distributions are inherited from
  * the source snapshot, so cross-scale comparisons are valid within
  * ScaleUp-produced data, and against the source scale itself.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val Array(srcDir, dstDir, factorStr) = args
    val factor = factorStr.toInt
    require(factor >= 1 && factor <= 1000, s"factor out of range: $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.get("graft-scaleup", s"local[$cpus]", cpus.toInt)
    run(spark, srcDir, dstDir, factor)
    spark.stop()
  }

  def run(spark: SparkSession, srcDir: String, dstDir: String, factor: Int): Unit = {
    def load(name: String): DataFrame = Tables.table(spark, srcDir, name)
    // Replicated tables repartition before the write: the source scales
    // ship one small file per table, and a factor-× copy written as 1–2
    // big single-row-group files caps downstream scan parallelism at 1–2
    // tasks (observed: a 10× events table JSON-parsed by ONE task).
    // A multi-file layout is what any real lake has; `factor` files
    // keeps per-file size equal to the source's.
    def save(df: DataFrame, name: String, nFiles: Int = 1): Unit = {
      val out = if (nFiles > 1) df.repartition(nFiles) else df
      out.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")
    }
    // copy index frame: broadcast so replication is a map-side fanout,
    // never a shuffle — the Bench staging pattern
    val copies = broadcast(spark.range(factor).select(col("id").as("_c")))

    /** Replicate with per-domain key offsets: stride per column. */
    def rep(df: DataFrame, strides: Map[String, Long]): DataFrame =
      df.crossJoin(copies).select(
        df.columns.toIndexedSeq.map { c =>
          strides.get(c) match {
            case Some(s) => (col(c) + col("_c") * s).as(c)
            case None => col(c)
          }
        }: _*)

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key)).cast("long")).head().getLong(0) + 1L

    save(load("region"), "region")
    save(load("nation"), "nation")

    val customer = load("customer")
    val supplier = load("supplier")
    val part = load("part")
    val orders = load("orders")
    val custS = stride(customer, "c_custkey")
    val suppS = stride(supplier, "s_suppkey")
    val partS = stride(part, "p_partkey")
    val orderS = stride(orders, "o_orderkey")
    save(rep(customer, Map("c_custkey" -> custS)), "customer", factor)
    save(rep(supplier, Map("s_suppkey" -> suppS)), "supplier", factor)
    save(rep(part, Map("p_partkey" -> partS)), "part", factor)
    save(rep(orders, Map("o_orderkey" -> orderS, "o_custkey" -> custS)), "orders", factor)
    save(rep(load("lineitem"), Map(
      "l_orderkey" -> orderS, "l_partkey" -> partS, "l_suppkey" -> suppS)),
      "lineitem", factor)

    // events via Tables.events so TIMESTAMP(NANOS) converts on read; the
    // re-export carries plain micros, which Tables.events passes through
    val events = Tables.events(spark, srcDir)
    save(rep(events, Map(
      "event_id" -> stride(events, "event_id"),
      "user_id" -> stride(events, "user_id"))),
      "events", factor)

    val docs = load("documents")
    val docS = stride(docs, "doc_id")
    save(docs.crossJoin(copies).select(
      (col("doc_id") + col("_c") * docS).as("doc_id"),
      when(col("_c") === 0, col("text")).otherwise(
        // disjoint per-copy vocabulary: suffix every word with the copy
        // index so cross-copy shingle/minhash collisions vanish
        array_join(transform(split(col("text"), " "),
          w => concat(w, col("_c").cast("string"))), " ")).as("text"),
      col("lang"),
      when(col("_c") === 0, col("source"))
        .otherwise(concat(col("source"), lit("_"), col("_c"))).as("source"),
      when(col("_c") === 0, col("n_chars"))
        .otherwise(length(array_join(transform(split(col("text"), " "),
          w => concat(w, col("_c").cast("string"))), " ")).cast("long"))
        .as("n_chars")),
      "documents", factor)

    val emb = load("embeddings")
    val vecS = stride(emb, "vec_id")
    save(emb.crossJoin(copies).select(
      (col("vec_id") + col("_c") * vecS).as("vec_id"),
      when(col("_c") === 0, col("embedding")).otherwise(
        transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), col("_c"), i), lit(1000))
            .cast("double") / lit(1000.0) - lit(0.5)) * lit(0.1))
            .cast("float"))).as("embedding"),
      col("label")),
      "embeddings", factor)
  }
}
