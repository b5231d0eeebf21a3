package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{ProductQuantization, Similarity}
import graft.queries.Det

/** Production-knob retune measurement (SCALE.md §10k, VERDICT r10
  * task 4).
  *
  * Registry gates PIN their knobs so the DuckDB oracle replays the
  * identical computation at every scale — which means a knob that a
  * production deployment would scale with the corpus (IVF's cell count
  * `nlist`) is frozen at its sf0.1 value inside the gate, and the
  * gate's decade ratio then measures the frozen knob, not the
  * operator. This main measures the RETUNED operator: IVFPQ with
  * `nlist ∝ √N` (the standard IVF sizing — cell-assignment cost N·nlist
  * and per-query candidate count nProbe·N/nlist balance at √N), with
  * recall@10 against the exact brute-force top-k reported alongside the
  * wall time, so a ratio drop that merely traded away recall is visible
  * in the same JSON line.
  *
  * `nlist` is implemented as the deterministic stride sampler
  * (`vec_id % stride == 0`, Similarity.ivfCentroids), so `nlist = N /
  * stride` and √N sizing means `stride ∝ √N` — pass the stride for the
  * scale under test (gate baseline: 64 at sf0.1/N=2000 → 202 at
  * sf1/N=20k → 640 at sf10/N=200k holds nlist/√N constant).
  *
  * Usage: runMain graft.ScaleTune ivfpq <sfDir> <stride>
  *        runMain graft.ScaleTune dbscan <sfDir> <latSites> <lonSites> <maxAbsLat>
  * Prints one JSON line: {"dir":…,"n":…,"stride":…,"nlist":…,
  * "ivfpq_secs":…,"recall_mean":…,"recall_min":…}
  */
object ScaleTune {
  def main(args: Array[String]): Unit = args(0) match {
    case "ivfpq"  => ivfpq(args(1), args(2).toInt)
    case "dbscan" => dbscan(args(1), args(2).toInt, args(3).toInt,
      args(4).toDouble)
    case "dbscan_cd" => dbscanCd(args(1), args(2).toInt, args(3).toInt,
      args(4).toDouble, args(5))
    case "pq"     => pqSweep(args(1), args(2).toInt)
    case "adamic" => adamicCap(args(1), args(2).toInt)
    case "semdedup" => semdedupKnob(args(1), args(2).toInt, args(3).toInt)
    case other => sys.error(s"unknown ScaleTune mode: $other")
  }

  /** Constant-density dbscan ORACLE run (r14, VERDICT r13 task 5): the
    * §10l decade point proved the engine's row scaling on the
    * area-scaled lattice but carried no oracle row — the fixed-lattice
    * sf10 replica's quadratic pair mass walls DuckDB, and that wall is
    * the FIXTURE's, not the operator's. This mode makes the
    * constant-density shape checkable end-to-end: derive the
    * area-scaled points, land them as parquet (the shared input BOTH
    * engines read — no cross-engine lattice arithmetic to trust), run
    * the identical gate operator, dump the result sorted (natural
    * partitioning — the coalesce(1) instrument is exactly what task 4
    * retired at this scale), and emit the iterative oracle script with
    * the pts source swapped to the parquet table (loop fragments
    * byte-identical to the registry gate's — MiningQueries.
    * dbscanIterOracle). tools/check.py then compares as usual:
    *   GRAFT_CHECK_MEM=80GB python3 tools/check.py <sfDir> <outDir>
    */
  def dbscanCd(dir: String, latSites: Int, lonSites: Int,
      maxAbsLat: Double, outDir: String): Unit = {
    val spark = graft.util.Sessions.get("graft-scaletune", "local[32]", 32)
    val pts = graft.sources.Tables.events(spark, dir).select(
      col("event_id"),
      (lit(40.2) + (col("user_id") % latSites) * lit(0.0008)).as("lat"),
      (lit(-74.6) + (col("event_id") % lonSites) * lit(0.0008)).as("lon"))
    val ptsPath = s"$outDir/pts_parquet"
    pts.write.mode("overwrite").parquet(ptsPath)
    val shared = spark.read.parquet(ptsPath)
    val n = shared.count()
    val t0 = System.nanoTime()
    graft.ops.Spatial.dbscan(shared, "event_id", "lat", "lon",
        radiusM = 300.0, minPts = 5, cellDeg = 0.0065,
        maxAbsLatDeg = maxAbsLat)
      .orderBy("point_id")
      .write.mode("overwrite").parquet(s"$outDir/q_dbscan_cd")
    val secs = (System.nanoTime() - t0) / 1e9
    def q(s: String) = graft.serve.Json.quote(s)
    def arr(xs: Seq[String]) = xs.map(q).mkString("[", ",", "]")
    val o = graft.queries.MiningQueries.dbscanIterOracle(
      s"SELECT event_id, lat, lon FROM '$ptsPath/*.parquet'")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      s"""{${q("q_dbscan_cd")}: ${q("-- iterative (oracle_iter.json)")}}""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_iter.json"),
      s"""{${q("q_dbscan_cd")}: {${q("setup")}: ${arr(o.setup)}, """ +
        s"""${q("loop")}: ${arr(o.loop)}, ${q("fixpoint")}: ${q(o.fixpoint)}, """ +
        s"""${q("max_rounds")}: ${o.maxRounds}, ${q("final")}: ${q(o.finalSql)}}}""")
    println(f"""{"dir":"$dir","n":$n,"lat_sites":$latSites,""" +
      f""""lon_sites":$lonSites,"dbscan_write_secs":$secs%.3f,"out":"$outDir"}""")
    spark.stop()
  }

  /** PQ-resolution sweep (r12, VERDICT r11 task 5): §10k measured the
    * COARSE knob (nlist ∝ √N) and left the PQ codebook resolution
    * flagged — ADC recall ≈ 0.1 at m=8/k=16 is priced per byte, not
    * per cell. This mode sweeps m ∈ {8,16,32} × k ∈ {16,256} at one
    * scale and reports, per combination: end-to-end wall (train +
    * encode + IVFPQ search, the gate's pipeline with only the codebook
    * shape swapped), code size (m·log₂k bits/vector — the memory the
    * sketch actually costs at 100 TB, where raw d=64 float vectors are
    * 256 bytes), and ADC recall@10 vs exact brute-force cosine. The
    * gate itself stays at m=8/k=16 — hash determinism pins it — this
    * is the production-sizing evidence beside it.
    *
    * Usage: runMain graft.ScaleTune pq <sfDir> <stride>
    */
  def pqSweep(dir: String, stride: Int): Unit = {
    val spark = graft.util.Sessions.get("graft-scaletune", "local[32]", 32)
    val emb = graft.sources.Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val qd = queries.select(col("qid"), col("qv").as("qe"))
    val cd = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val exact = Similarity.cosineTopK(qd, cd, k = 10, scoreRounding = Det.r6)
      .cache()
    exact.count()
    // untimed warm-up: the first combination otherwise pays the whole
    // PQ family's codegen/JIT bill and reads slower than finer configs
    ProductQuantization.train(emb, "vec_id", "embedding",
      m = 8, k = 16, iters = 2).count()
    for (m <- Seq(8, 16, 32); k <- Seq(16, 256)) {
      val t0 = System.nanoTime()
      val cb = ProductQuantization.train(emb, "vec_id", "embedding",
        m = m, k = k, iters = 2)
      val codes = ProductQuantization.encode(emb, "vec_id", "embedding", cb, m = m)
      // Queries are drawn from the corpus, so a raw ADC top-10 can
      // contain the self row (when the codebook is fine enough to rank
      // it) — with self filtered afterwards that left only 9 true
      // candidates vs the 10-row exact baseline (cosineTopK excludes
      // self by construction), capping r12's reported ADC recall at
      // 0.9. Both instruments now take top-11, drop self, and re-rank
      // to EXACTLY the top-10 non-self — the precise mirror of exact
      // (11-after-filter alone can leave 11 rows when the coarse
      // codebook misses self, mildly inflating recall instead).
      def top10NonSelf(raw: DataFrame): DataFrame =
        raw.filter(col("qid") =!= col("cid"))
          .withColumn("_r", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("qid")
              .orderBy(col("ad2"), col("cid"))))
          .filter(col("_r") <= 10)
      val approx = ProductQuantization.ivfPqTopK(emb, "vec_id", "embedding",
        codes, cb, queries, m = m, topK = 11, stride = stride, nProbe = 2)
      approx.count()
      val secs = (System.nanoTime() - t0) / 1e9
      // two recall instruments, both vs exact brute-force cosine:
      //  - ivfpq: ADC over the IVF-pruned candidates (the gate's path)
      //    — on clustered fixtures the small pool makes this
      //    COARSE-limited, nearly flat in (m, k);
      //  - full-scan ADC (ProductQuantization.topK over the whole
      //    corpus): the instrument where codebook resolution BINDS —
      //    coarse codes collide distant vectors into ad2 ties that
      //    flood the top-10 (the §10k "≈0.1" figure), finer m/k
      //    resolve them. This is the number the m/k knob buys.
      val adcRec = Similarity.recallAtK(top10NonSelf(approx), exact)
        .agg(avg(col("recall")).as("mean"), min(col("recall")).as("min"))
        .head()
      val fullRec = Similarity.recallAtK(
        top10NonSelf(
          ProductQuantization.topK(codes, cb, queries, m = m, topK = 11)),
        exact)
        .agg(avg(col("recall")).as("mean"), min(col("recall")).as("min"))
        .head()
      val bits = m * (math.log(k) / math.log(2)).round
      println(f"""{"dir":"$dir","n":$n,"stride":$stride,"m":$m,"k":$k,""" +
        f""""bits_per_vec":$bits,"bytes_per_vec":${bits / 8.0}%.1f,""" +
        f""""pq_secs":$secs%.3f,""" +
        f""""adc_recall_mean":${adcRec.getDouble(0)}%.4f,""" +
        f""""adc_recall_min":${adcRec.getDouble(1)}%.4f,""" +
        f""""fullscan_recall_mean":${fullRec.getDouble(0)}%.4f,""" +
        f""""fullscan_recall_min":${fullRec.getDouble(1)}%.4f}""")
    }
    spark.stop()
  }

  /** Constant-density dbscan decade point (VERDICT r10 task 8): the
    * gate fixture's point lattice has a FIXED ~1M-site area
    * ((user_id % 997, event_id % 1013) at 0.0008°), so a 100× replica
    * raises per-site occupancy 100× — a density stress, not a size
    * measurement, which is why the sf10 dbscan point was excluded from
    * §10g. This mode re-derives the points with the lattice AREA scaled
    * to the replica (sites ∝ N keeps density constant, e.g. 997×1013 at
    * sf0.1 → 9970×10130 at sf10) and times the identical dbscan
    * (300 m, minPts 5, cell 0.0065°) — measuring the grid join's row
    * scaling at the fixture's own density. maxAbsLat must cover the
    * grown lattice's top edge (the lon-meter bound the grid uses).
    */
  def dbscan(dir: String, latSites: Int, lonSites: Int,
      maxAbsLat: Double): Unit = {
    val spark = graft.util.Sessions.get("graft-scaletune", "local[32]", 32)
    val pts = graft.sources.Tables.events(spark, dir).select(
      col("event_id"),
      (lit(40.2) + (col("user_id") % latSites) * lit(0.0008)).as("lat"),
      (lit(-74.6) + (col("event_id") % lonSites) * lit(0.0008)).as("lon"))
    val n = pts.count()
    val t0 = System.nanoTime()
    val out = graft.ops.Spatial.dbscan(pts, "event_id", "lat", "lon",
      radiusM = 300.0, minPts = 5, cellDeg = 0.0065,
      maxAbsLatDeg = maxAbsLat)
    val rows = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"dir":"$dir","n":$n,"lat_sites":$latSites,""" +
      f""""lon_sites":$lonSites,"dbscan_secs":$secs%.3f,"rows":$rows}""")
    spark.stop()
  }

  def ivfpq(dir: String, stride: Int): Unit = {
    val spark = graft.util.Sessions.get("graft-scaletune", "local[32]", 32)
    val emb = graft.sources.Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

    // timed section mirrors the q_sim_ivfpq gate end-to-end (train +
    // encode + search), with only the coarse-quantizer stride swapped
    val t0 = System.nanoTime()
    val cb = ProductQuantization.train(emb, "vec_id", "embedding",
      m = 8, k = 16, iters = 2)
    val codes = ProductQuantization.encode(emb, "vec_id", "embedding", cb, m = 8)
    val approx = ProductQuantization.ivfPqTopK(emb, "vec_id", "embedding",
      codes, cb, queries, m = 8, topK = 10, stride = stride, nProbe = 2)
      .withColumn("ad2", Det.r6(col("ad2")))
    approx.count()
    val secs = (System.nanoTime() - t0) / 1e9

    // recall instruments, exact brute-force cosine top-10 as ground
    // truth (embeddings are L2-normalized, so cosine and L2 rank
    // identically on EXACT vectors):
    //  - ivf_recall: the q_ann_recall_ivf instrument with THIS stride —
    //    exact scoring within the probed cells, so it isolates what
    //    nlist/nProbe actually control (coarse-cell pruning);
    //  - adc_recall: the end-to-end IVFPQ list vs exact (self-pairs
    //    dropped from the approx side to match the ground truth's
    //    qid ≠ cid contract) — includes the PQ quantization reorder
    //    on top, which nlist does NOT control (m/k do).
    val qd = queries.select(col("qid"), col("qv").as("qe"))
    val cd = emb.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val exact = Similarity.cosineTopK(qd, cd, k = 10, scoreRounding = Det.r6)
    val ivfRec = Similarity.recallAtK(
      Similarity.ivfTopK(qd, cd, k = 10, stride = stride, nProbe = 2,
        scoreRounding = Det.r6), exact)
      .agg(avg(col("recall")).as("mean"), min(col("recall")).as("min"))
      .head()
    val adcRec = Similarity.recallAtK(
      approx.filter(col("qid") =!= col("cid")), exact)
      .agg(avg(col("recall")).as("mean"), min(col("recall")).as("min"))
      .head()
    println(f"""{"dir":"$dir","n":$n,"stride":$stride,""" +
      f""""nlist":${n / stride},"ivfpq_secs":$secs%.3f,""" +
      f""""ivf_recall_mean":${ivfRec.getDouble(0)}%.4f,""" +
      f""""ivf_recall_min":${ivfRec.getDouble(1)}%.4f,""" +
      f""""adc_recall_mean":${adcRec.getDouble(0)}%.4f,""" +
      f""""adc_recall_min":${adcRec.getDouble(1)}%.4f}""")
    spark.stop()
  }

  /** Priced hub-cap run for Adamic–Adar at scales where the gate's
    * p99-derived cap (182 on the co-purchase graph) shuffles more wedge
    * pairs than a single host's scratch disk holds (r12: sf10 died at
    * ~0.4–0.5 TB vs 75 GB). Wedge volume scales ~cap² per center, so
    * maxNeighborDeg ∈ {32, 64} prices the knob a production run would
    * turn: the scores a tighter cap drops are hub-centered ≈0-signal
    * pairs (1/log(deg) terms of max-degree centers). Reports wall,
    * result rows, and total shuffle read/write bytes from the stage
    * metrics — the resource the r12 run actually died on.
    *
    * Usage: runMain graft.ScaleTune adamic <sfDir> <cap>
    */
  def adamicCap(dir: String, cap: Int): Unit = {
    val spark = graft.util.Sessions.get("graft-scaletune", "local[32]", 32)
    val sc = spark.sparkContext
    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val shufRead = new java.util.concurrent.atomic.AtomicLong()
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    // edge build outside the timed window (same as the gate's
    // checkpoint discipline): the knob under price is the wedge stage
    val eGen = graft.util.Lineage.checkpoint(
      graft.ops.Graphs.coOccurrenceEdges(
        graft.sources.Tables.table(spark, dir, "lineitem"),
        "l_orderkey", "l_partkey"))
    val nEdges = eGen.df.count()
    val w0 = shufWrite.get(); val r0 = shufRead.get()
    val t0 = System.nanoTime()
    val out = graft.ops.Graphs.adamicAdar(
      eGen.df, maxNeighborDeg = cap, topK = 50)
    val rows = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // listener events drain asynchronously (listenerBus is
    // spark-private); a bounded settle is enough for a one-line report
    Thread.sleep(2000)
    println(f"""{"dir":"$dir","cap":$cap,"edges":$nEdges,"rows":$rows,""" +
      f""""adamic_secs":$secs%.1f,""" +
      f""""shuffle_write_gb":${(shufWrite.get() - w0) / 1e9}%.2f,""" +
      f""""shuffle_read_gb":${(shufRead.get() - r0) / 1e9}%.2f}""")
    spark.stop()
  }

  /** Embedding-dedup production-knob retune (r14). The q_semdedup /
    * q_dedup_embed gates pin k=8 / nBits=4 at every scale for oracle
    * determinism, so their sf10 decade rows measure cell occupancy
    * growing with N (pair mass ∝ N²/cells), not the operator — the
    * SemDeDup recipe scales clusters WITH the corpus (~100k cells at
    * web scale; `semanticDupSurvivors` scaladoc) and LSH dedup adds
    * hash bits. This mode runs BOTH operators with the scaled knobs
    * (k ∝ N keeps cell size constant; nBits ≈ log2(N/occupancy) keeps
    * bucket occupancy constant) and prints one JSON line:
    * {"dir","n","k","nbits","semdedup_secs","survivors",
    *  "embedpairs_secs","pairs"}.
    */
  def semdedupKnob(dir: String, k: Int, nBits: Int): Unit = {
    val spark = graft.util.Sessions.get("graft-scaletune", "local[32]", 32)
    val emb = graft.sources.Tables.table(spark, dir, "embeddings")
    val n = emb.count()
    val t0 = System.nanoTime()
    val survivors = graft.ops.Dedup.semanticDupSurvivors(
      emb, "vec_id", "embedding", k = k, iters = 2, threshold = 0.35).count()
    val t1 = System.nanoTime()
    val pairs = graft.ops.Dedup.embeddingDupPairs(
      emb.select("vec_id", "embedding"), "vec_id", "embedding",
      threshold = 0.35, nBits = nBits).count()
    val t2 = System.nanoTime()
    println(
      s"""{"dir":${graft.serve.Json.quote(dir)},"n":$n,"k":$k,""" +
      f""""nbits":$nBits,"semdedup_secs":${(t1 - t0) / 1e9}%.3f,""" +
      f""""survivors":$survivors,"embedpairs_secs":${(t2 - t1) / 1e9}%.3f,""" +
      s""""pairs":$pairs}""")
    spark.stop()
  }
}
