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
