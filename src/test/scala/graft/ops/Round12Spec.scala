package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Round-12 fix pins (VERDICT r11 tasks + advisor items): the two new
  * streaming bridge families (custom-state sessionize, watermarked
  * dedup) against their batch twins on the real fixture, and the
  * microsecond-precision session-state contract the fmgs gate caught.
  */
class Round12Spec extends SparkTestBase {

  test("fmgs sessionize bridge equals the session_window bridge at sf0.001") {
    // two mechanisms, one relation: the flatMapGroupsWithState
    // sessionizer (event-time timers, emit-on-close) must produce the
    // SAME session rows as the declarative session_window aggregate on
    // this fixture (whose micro-precision timestamps carry no
    // exact-gap pairs — at that measure-zero boundary the two
    // mechanisms deliberately differ: the sessionizer follows the
    // islands oracle, session_window coalesces; EventStreamsSpec r13
    // pins both), end = last + gap, and
    // per-session count/sum all agree
    val workF = java.nio.file.Files
      .createTempDirectory("graft_fmgs_bridge").toString
    val outF = graft.streaming.EventStreams
      .sessionizeFmgsEventsDirToParquet(spark, Sf0001, workF)
    val fmgs = spark.read.parquet(outF)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), graft.queries.Det.r6(col("sum_value")).as("sv"))
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    val batch = graft.sources.Tables.events(spark, Sf0001)
      .groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.Det.dsum(col("value")).as("sv"))
      .select(col("user_id"), col("session_window.start"),
        col("session_window.end"), col("n_events"), col("sv"))
      .orderBy("user_id", "start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4)))
    assert(fmgs.nonEmpty && fmgs.toSeq == batch.toSeq)
  }

  test("fmgs session bounds keep microsecond precision (no ms truncation)") {
    // the fixture's timestamps carry sub-millisecond digits; state that
    // rode Timestamp.getTime (millis) zeroed them — a session_start is
    // an event time verbatim, so at least one must keep micros % 1000
    val work = java.nio.file.Files
      .createTempDirectory("graft_fmgs_micros").toString
    val out = graft.streaming.EventStreams
      .sessionizeFmgsEventsDirToParquet(spark, Sf0001, work)
    val subMs = spark.read.parquet(out)
      .filter(col("user_id") >= 0)
      .filter(unix_micros(col("session_start")) % 1000 =!= 0)
      .count()
    assert(subMs > 0, "all session_start micros were multiples of 1 ms — " +
      "state truncated event times to millis again")
  }

  test("watermarked dedup bridge equals the batch distinct at sf0.001") {
    val work = java.nio.file.Files
      .createTempDirectory("graft_dedup_wm_bridge").toString
    val out = graft.streaming.EventStreams
      .dedupStreamEventsDirToParquet(spark, Sf0001, work)
    val streamed = spark.read.parquet(out)
      .filter(col("user_id") >= 0)
      .select("user_id", "event_type", "day")
      .orderBy("user_id", "event_type", "day").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2)))
    val batch = graft.sources.Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
      .distinct()
      .orderBy("user_id", "event_type", "day").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    // and it actually deduplicated: the raw stream is strictly larger
    val raw = graft.sources.Tables.events(spark, Sf0001).count()
    assert(raw > streamed.length)
  }
}
