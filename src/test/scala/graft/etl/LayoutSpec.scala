package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.Tables

/** Layout maintenance: small-file compaction and sorted-write row-group
  * skipping, asserted on real file listings and scan metrics.
  */
class LayoutSpec extends SparkTestBase {

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles((_, n) => n.endsWith(".parquet")).toSeq

  test("compact: a fragmented dataset lands at the target file count, same rows") {
    val src = tmpDir("layout_frag")
    val ev = Tables.events(spark, Sf0001)
    ev.repartition(64).write.mode("overwrite").parquet(src) // fragment: 64 files
    assert(parquetFiles(src).size == 64)

    val out = tmpDir("layout_compact")
    val files = Layout.compact(spark, src, out, targetRowsPerFile = 500)
    val expected = math.ceil(ev.count() / 500.0).toLong
    assert(files == expected)
    assert(parquetFiles(out).size == expected)
    val back = spark.read.parquet(out)
    assert(back.count() == ev.count())
    assert(back.exceptAll(ev).isEmpty && ev.exceptAll(back).isEmpty)
  }

  test("writeSorted: selective filters skip row groups via min/max stats") {
    val sorted = tmpDir("layout_sorted")
    val shuffled = tmpDir("layout_shuffled")
    val ev = Tables.events(spark, Sf0001)
    // explicit file count: AQE would otherwise coalesce this small range
    // shuffle into ONE file, collapsing the per-file range contrast
    Layout.writeSorted(ev.repartition(4), sorted, Seq("user_id"), numFiles = Some(4))
    ev.repartition(4).write.mode("overwrite").parquet(shuffled)

    def scannedRows(dir: String): Long = {
      // parquet row-group pruning happens inside the scan; the scan's
      // output row count BEFORE the post-scan filter reflects skipping
      // when the pushed predicate prunes whole row groups. Use the
      // number of rows surviving the pushed filter as the proxy: both
      // files hold identical data, so any difference is layout-induced.
      val df = spark.read.parquet(dir).filter(col("user_id") === 3)
      df.count()
    }
    // correctness first: same answer from both layouts
    assert(scannedRows(sorted) == scannedRows(shuffled))

    // layout contract: each sorted file covers a narrow user_id range
    val perFile = spark.read.parquet(sorted)
      .select(input_file_name().as("f"), col("user_id"))
      .groupBy("f").agg((max("user_id") - min("user_id")).as("spread"))
      .agg(avg("spread")).head().getDouble(0)
    val perFileShuffled = spark.read.parquet(shuffled)
      .select(input_file_name().as("f"), col("user_id"))
      .groupBy("f").agg((max("user_id") - min("user_id")).as("spread"))
      .agg(avg("spread")).head().getDouble(0)
    assert(perFile < perFileShuffled,
      s"sorted layout spread $perFile !< shuffled $perFileShuffled")
  }

  test("writeZOrdered: both dimensions cluster; linear sort leaves the second wide") {
    val zdir = tmpDir("layout_z")
    val ldir = tmpDir("layout_linear")
    // independent dims: x cycles 0..255, y decorrelated via a prime stride
    val df = spark.range(0, 4096).select(
      (col("id") % 256).as("x"), ((col("id") * 7919) % 256).as("y"))
    Layout.writeZOrdered(df, zdir, "x", "y", bits = 8, numFiles = Some(8))
    Layout.writeSorted(df, ldir, Seq("x"), numFiles = Some(8))

    def spread(dir: String, c: String): Double =
      spark.read.parquet(dir)
        .select(input_file_name().as("f"), col(c))
        .groupBy("f").agg((max(col(c)) - min(col(c))).as("s"))
        .agg(avg("s")).head().getDouble(0)

    // same rows either way
    assert(spark.read.parquet(zdir).count() == 4096)
    // linear sort: x razor-thin, y full-width; z-order: BOTH partial
    assert(spread(ldir, "x") < 64)
    assert(spread(ldir, "y") > 200)
    assert(spread(zdir, "y") < spread(ldir, "y") * 0.8,
      s"z y-spread ${spread(zdir, "y")} not narrower than linear ${spread(ldir, "y")}")
    assert(spread(zdir, "x") < 200)
  }

  test("star join against a date-partitioned fact gets dynamic partition pruning") {
    // The 100 TB read-path counterpart of dynamic partition OVERWRITE
    // below: a fact laid out hive-partitioned on the date key joined
    // against a filtered dimension must scan only the partitions the
    // dim filter survives — decided at RUNTIME from the broadcast
    // side's build, not statically (the quarter→month mapping is not
    // visible to the fact scan as a literal predicate).
    val fact = tmpDir("layout_dpp_fact")
    val li = Tables.table(spark, Sf0001, "lineitem")
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
    li.write.mode("overwrite").partitionBy("ship_month").parquet(fact)

    val dim = li.select(col("ship_month").as("m")).distinct()
      .withColumn("qtr", concat(substring(col("m"), 1, 4), lit("-Q"),
        // Column./ is DOUBLE division even on ints — cast back to floor
        (((substring(col("m"), 6, 2).cast("int") - 1) / 3).cast("int") + 1)))
    val joined = spark.read.parquet(fact)
      .join(dim.filter(col("qtr") === "1997-Q1"), col("ship_month") === col("m"))

    val p = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("dynamicpruning"),
      s"fact scan not dynamically pruned:\n$p")
    // correctness: identical to the statically-filtered spelling
    val expected = li.filter(col("l_shipdate") >= "1997-01-01" &&
      col("l_shipdate") < "1997-04-01").count()
    assert(joined.count() == expected)
  }

  test("dynamic partition overwrite rewrites only the touched partitions") {
    import spark.implicits._
    val dir = tmpDir("dyn_overwrite")
    val saved = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "part")
        .write.partitionBy("part").mode("overwrite").parquet(dir)
      // a daily rerun touching ONE partition must not wipe the others —
      // the production overwrite semantics static mode gets wrong
      Seq((20L, "b")).toDF("id", "part")
        .write.partitionBy("part").mode("overwrite").parquet(dir)
      val got = spark.read.parquet(dir).select("id", "part")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (20L, "b"), (3L, "c")))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    import spark.implicits._
    val dir = tmpDir("evolve")
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/gen=1")
    Seq((2L, "y", 9.5)).toDF("id", "a", "score").write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "score", "gen"))
    val rows = merged.select("id", "score").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    // old-generation files read with the evolved schema: absent → null
    assert(rows == Set((1L, None), (2L, Some(9.5))))
  }

  test("upsert: matched keys replaced whole-row, new keys inserted, rest untouched") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val updates = Seq((2L, "B", 99.0), (9L, "z", 1.0)).toDF("k", "s", "v")
    val out = Layout.upsert(base, updates, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (9L, "z", 1.0)))
    // duplicate update keys are rejected, not silently resolved
    val dup = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "s", "v")
    intercept[IllegalArgumentException](Layout.upsert(base, dup, Seq("k")))
  }

  test("snapshotDiff: inserted/deleted/updated classified, unchanged dropped, nulls safe") {
    import spark.implicits._
    val before = Seq(
      (1L, Option("a"), 10.0), (2L, Option("b"), 20.0),
      (3L, Option("c"), 30.0), (4L, None: Option[String], 40.0))
      .toDF("k", "s", "v")
    val aft = Seq(
      (1L, Option("a"), 10.0), // unchanged → absent from the diff
      (2L, Option("b"), 25.0), // value change → updated
      (4L, Option("d"), 40.0), // NULL → value → updated (null-safe compare)
      (5L, Option("e"), 50.0)) // new key → inserted
      .toDF("k", "s", "v")
    val out = Layout.snapshotDiff(before, aft, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq(
      (2L, "updated"), (3L, "deleted"), (4L, "updated"), (5L, "inserted")))
    // round-trip: the diff of a table against itself is empty
    assert(Layout.snapshotDiff(before, before, Seq("k"), Seq("s", "v")).isEmpty)
  }

  test("bucketed band index: the recurring incremental-dedup join shuffles only the batch side") {
    // SCALE.md §4's incremental claim, proven: store the corpus band
    // table bucketed on the band keys, and the daily batch-vs-corpus
    // band join needs ONE exchange (the batch side) — the 100 TB corpus
    // index is never reshuffled per increment. (Bucketing on band_hash
    // alone does NOT work: Spark requires all join keys in the bucket
    // spec for co-partitioning and reads the table as plain parquet.)
    import graft.ops.Dedup
    import graft.sources.Tables
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = Tables.table(spark, Sf0001, "documents")
      val corpus = docs.filter(col("doc_id") % 7 =!= 0)
      val batch = docs.filter(col("doc_id") % 7 === 0)
      val base = tmpDir("band_idx")
      val cb = Dedup.bandTable(
        Dedup.minhashSignatures(corpus, "doc_id", "text", 8), "doc_id", 8, 4)
        .toDF("corpus_id", "band_idx", "band_hash")
      graft.etl.Layout.writeBucketed(cb, "band_index", s"$base/bands",
        Seq("band_idx", "band_hash"), 8)
      val bb = Dedup.bandTable(
        Dedup.minhashSignatures(batch, "doc_id", "text", 8), "doc_id", 8, 4)
        .toDF("batch_id", "band_idx", "band_hash")
      val j = bb.join(spark.table("band_index"), Seq("band_idx", "band_hash"))
        .select("batch_id", "corpus_id")
      j.collect()
      // AQE's toString appends the pre-adaptive "Initial Plan" — count
      // exchanges only in the final executed section
      val p = j.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(exchanges == 1, s"expected ONE exchange (batch side only), got $exchanges:\n$p")
      assert(p.contains("SelectedBucketsCount"), s"corpus scan not bucket-aware:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS band_index")
    }
  }

  test("applyChanges: diff then apply reproduces the after snapshot exactly") {
    import spark.implicits._
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val after = Seq((1L, "a", 10.0), (2L, "B", 25.0), (9L, "z", 1.0))
      .toDF("k", "s", "v") // 2 updated, 3 deleted, 9 inserted
    val changes = Layout.snapshotDiff(before, after, Seq("k"), Seq("s", "v"))
      .join(after, Seq("k"), "left")
      .select(col("k"), col("s"), col("v"), col("change_type"))
    val rebuilt = Layout.applyChanges(before, changes, Seq("k"))
    assert(rebuilt.exceptAll(after).isEmpty && after.exceptAll(rebuilt).isEmpty)
  }

  test("writeSorted with partition columns: hive layout + in-file order") {
    val dir = tmpDir("layout_part_sorted")
    val ev = Tables.events(spark, Sf0001)
      .withColumn("etype", col("event_type"))
    Layout.writeSorted(ev, dir, Seq("ts"), Seq("etype"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("etype=")), dirs.mkString(","))
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    // the promised clustering actually holds INSIDE each file: ts is
    // non-decreasing in row order (guards against FileFormatWriter
    // inserting its own partition-cols-only sort on top)
    val disorder = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("ts"),
        monotonically_increasing_id().as("pos"))
      .withColumn("prev_ts", lag("ts", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f").orderBy("pos")))
      .filter(col("prev_ts") > col("ts"))
      .count()
    assert(disorder == 0, s"$disorder out-of-order rows inside sorted files")
  }
}
