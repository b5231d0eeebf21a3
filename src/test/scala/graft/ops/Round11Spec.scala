package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.Det

/** Round-11 fix pins (VERDICT r10 tasks + advisor items): the dsum6
  * fast path's value identity with dsum, the grouped-adjacency
  * Adamic–Adar's equivalence to the reference self-join spelling, and
  * the streaming replay harness's loud-failure guards.
  */
class Round11Spec extends SparkTestBase {
  import spark.implicits._

  test("dsum6 equals dsum exactly on 6-dp inputs (the long fast path is a pure speedup)") {
    // adversarial 6-dp values: boundary magnitudes, many groups, values
    // whose double representation sits below/above the true decimal
    val vals = (1 to 5000).map { i =>
      val raw = math.sin(i.toDouble) * 1000.0 + 1.0 / math.log(i + 2.0)
      (i % 37, math.floor(raw * 1e6 + 0.5) / 1e6) // an r6 output by construction
    }
    val df = vals.toDF("g", "x").repartition(16)
    val a = df.groupBy("g").agg(Det.dsum(col("x")).as("s"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    val b = df.groupBy("g").agg(Det.dsum6(col("x")).as("s"))
      .orderBy("g").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("grouped-adjacency adamicAdar equals the self-join spelling (same wedge multiset)") {
    // a graph with hubs above and below the cap, multi-edges absent
    // (canonical u < v distinct), triangles and distance-2 pairs
    val edges = (for {
      u <- 0L to 25L; v <- (u + 1) to 25L
      if (u * 31 + v * 17) % 5 == 0 || v == u + 1
    } yield (u, v)).toDF("u", "v")
    val cap = 10
    val viaOp = Graphs.adamicAdar(edges, maxNeighborDeg = cap, topK = 1000)
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the r10 reference spelling: center-keyed adjacency self-join
    val sym = edges.select(col("u"), col("v"))
      .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy(col("u").as("w")).agg(count(lit(1)).as("_deg"))
    val adj = sym.select(col("u").as("w"), col("v").as("x"))
      .join(deg, "w")
      .filter(col("_deg") <= cap && col("_deg") >= 2)
      .withColumn("_aw", Det.r6(lit(1.0) / log(col("_deg").cast("double"))))
    val viaJoin = adj.select(col("w"), col("x").as("a"), col("_aw"))
      .join(adj.select(col("w"), col("x").as("b")), "w")
      .filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), Det.dsum(col("_aw")).as("aa"))
      .join(edges.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
      .orderBy("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viaOp.nonEmpty && viaOp.toSeq == viaJoin.toSeq)
  }

  test("replay harness fails loudly on negative user_id (in-band sentinel guard)") {
    val src = java.nio.file.Files.createTempDirectory("graft_r11_neg").toString
    Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), -7L, "view", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 3L, "click", 2.0))
      .toDF("ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$src/events.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.replayEventsDirToParquet(
        spark, src, s"$src/work", _.groupBy("user_id").count())
    }
    assert(e.getMessage.contains("negative user_id"))
  }

  test("stream-stream interval-join bridge equals the batch join at sf0.001") {
    // the third batch↔stream bridge end-to-end on the real fixture: a
    // watermarked click→purchase self-join over the replayed file
    // stream must emit EXACTLY the batch interval join's pair set —
    // inner joins emit once per match, so no flush subtleties hide here
    val work = java.nio.file.Files
      .createTempDirectory("graft_attr_bridge").toString
    val out = graft.streaming.EventStreams
      .attributionJoinEventsDirToParquet(spark, Sf0001, work, "2 hours")
    val streamed = spark.read.parquet(out)
      // each sentinel row enters BOTH sides and matches itself
      // (click_ts == purchase_ts) — dropped like the gate does
      .filter(col("user_id") >= 0)
      .orderBy("user_id", "click_ts", "purchase_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getDouble(3), r.getDouble(4)))
    val ev = graft.sources.Tables.events(spark, Sf0001)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    val batch = c.join(p,
      col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 2 HOURS"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("click_value"), col("purchase_value"))
      .orderBy("user_id", "click_ts", "purchase_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getDouble(3), r.getDouble(4)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("outer stream-stream bridge equals the batch LEFT join at sf0.001") {
    // the watermark-gated null side: every never-converted click must
    // emit exactly one null-purchase row once the sentinels advance the
    // watermark past its 2 h window — equality with the batch LEFT
    // join checks both the match set AND the eviction-time emission
    val work = java.nio.file.Files
      .createTempDirectory("graft_attr_outer_bridge").toString
    val out = graft.streaming.EventStreams
      .attributionOuterEventsDirToParquet(spark, Sf0001, work, "2 hours")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2)),
        r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double]))
    val streamed = spark.read.parquet(out)
      .filter(col("user_id") >= 0) // the sentinel clicks' own null rows
      .select("user_id", "click_ts", "purchase_ts",
        "click_value", "purchase_value")
      .collect().map(key).sortBy(t => (t._1, t._2.getTime,
        t._3.map(_.getTime).getOrElse(Long.MinValue)))
    val ev = graft.sources.Tables.events(spark, Sf0001)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("value").as("click_value"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    val batch = c.join(p,
      col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 2 HOURS"),
      "left_outer")
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("click_value"), col("purchase_value"))
      .collect().map(key).sortBy(t => (t._1, t._2.getTime,
        t._3.map(_.getTime).getOrElse(Long.MinValue)))
    assert(streamed.exists(_._3.isEmpty),
      "expected at least one watermark-evicted unmatched click")
    assert(streamed.exists(_._3.nonEmpty), "expected matched pairs too")
    assert(streamed.toSeq == batch.toSeq)
  }

  test("bridge restart is exactly-once: kill mid-stream, resume, identical result") {
    // the production failure drill: stop() after 2 of the 6 replay
    // batches (failure injection), restart from the same checkpoint,
    // and require the final output to equal an uninterrupted run's —
    // committed batches skip, the in-flight batch replays into its own
    // OVERWRITTEN batch_id partition (the idempotent-sink contract)
    def sessionQuery(stream: org.apache.spark.sql.DataFrame) =
      stream
        .select(col("ts"), col("user_id"), col("value"))
        .withWatermark("ts", "0 seconds")
        .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          Det.dsum(col("value")).as("sum_value"))
        .select(col("session_window.start").as("session_start"),
          col("user_id"), col("n_events"), col("sum_value"))
    def run(work: String, resume: Boolean, interrupt: Option[Int]) =
      graft.streaming.EventStreams.replayEventsDirToParquet(
        spark, Sf0001, work, sessionQuery,
        resume = resume, interruptAfterBatches = interrupt)
    def readBack(out: String) = spark.read.parquet(out)
      .filter(col("user_id") >= 0)
      .select("session_start", "user_id", "n_events", "sum_value")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val workA = java.nio.file.Files
      .createTempDirectory("graft_restart_a").toString
    val outInterrupted = run(workA, resume = false, interrupt = Some(2))
    val partial = readBack(outInterrupted)
    val outResumed = run(workA, resume = true, interrupt = None)
    val resumed = readBack(outResumed)
    val workB = java.nio.file.Files
      .createTempDirectory("graft_restart_b").toString
    val clean = readBack(run(workB, resume = false, interrupt = None))
    assert(partial.length < clean.length,
      "the interrupt must actually cut the run short")
    assert(resumed.nonEmpty && resumed.toSeq == clean.toSeq,
      "resumed run diverged from the uninterrupted run")
  }

  test("stream-static dedup bridge equals the batch incremental pairs at sf0.001") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_inc_bridge").toString
    val out = graft.streaming.DocStreams
      .incrementalDedupDirToParquet(spark, Sf0001, work, threshold = 0.8)
    val streamed = spark.read.parquet(out)
      .select("batch_id", "corpus_id", "jac")
      .orderBy("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val d = graft.sources.Tables.table(spark, Sf0001, "documents")
    val batch = graft.ops.Dedup.incrementalNearDupPairs(
      d.filter(col("doc_id") % 5 =!= 0),
      d.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", threshold = 0.8)
      .orderBy("batch_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("heavy hitters: support_guaranteed is false below the retention bound") {
    // a:16 clears 16·3 ≥ 46; b:10 (30 < 46) is below the bound — if the
    // sketch keeps it, the flag must say so. Only a's presence is
    // GUARANTEED (freq > N/(cap+1)); every returned row's flag must
    // match the recomputed bound either way.
    val rows = Seq.fill(16)("a") ++ Seq.fill(10)("b") ++
      (1 to 20).map(i => s"t$i")
    val df = rows.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "text").repartition(8)
    val n = rows.size.toLong
    val out = TextAnalysis.heavyHitters(df, "text", k = 5, capacity = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.exists { case (t, _, g) => t == "a" && g })
    assert(out.forall { case (_, f, g) => g == (f * 3 >= n) })
  }
}
