package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingValidation

/** Streaming validation: the memory-sink batch must equal the batch-mode
  * computation over the same parquet (one engine, two execution modes). */
class StreamingSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("windowed streaming verdicts equal the batch aggregation") {
    val q = StreamingValidation.windowedVerdicts(spark, sfDir)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_verdicts")
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()

    // append mode only emits closed windows; recompute the batch equivalent
    // and compare the emitted subset row-for-row
    val streamed = spark.table("stream_verdicts")
      .collect().map(r => (String.valueOf(r.get(0)), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val m = col("event_id") % 5
    val malformed = when(m === 0, rtrim(col("props"), "}"))
      .when(m === 1, replace(col("props"), lit("\""), lit("'")))
      .when(m === 2, concat(lit("```json\n"), col("props"), lit("\n```")))
      .when(m === 3, replace(col("props"), lit("}"), lit(",}")))
      .otherwise(col("props"))
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"),
        graft.functions.JsonRepairFunctions.jsonStrictValid(spark, malformed).as("valid"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_rows"), count(when(!col("valid"), lit(1))).as("n_invalid"))
      .select(col("window.start"), col("event_type"), col("n_rows"), col("n_invalid"))
      .collect().map(r => (String.valueOf(r.get(0)), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    assert(streamed.nonEmpty, "stream emitted no closed windows")
    assert(streamed.subsetOf(batch),
      s"streamed rows disagree with batch: ${streamed.diff(batch).take(3)}")
  }

  test("watermark evicts state, drops late rows, and append emits only closed windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)] // (epoch seconds, event_type)
    val agg = mem.toDF().toDF("sec", "event_type")
      .select(timestamp_seconds(col("sec")).as("ts"), col("event_type"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_rows"))
      .select((unix_timestamp(col("window.start")) / 3600).cast("long").as("hour_id"),
        col("event_type"), col("n_rows"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_test").start()
    def h(hours: Long, min: Long = 0): Long = hours * 3600 + min * 60
    try {
      // batch 1: hours 0 (x2) and 1 — watermark still below every window
      // end, so append emits NOTHING yet
      mem.addData((h(0, 10), "a"), (h(0, 20), "a"), (h(1, 30), "a"))
      q.processAllAvailable()
      assert(spark.table("late_test").count() == 0,
        "append emitted a window the watermark had not closed")
      // batch 2: an event at 04:30 advances the watermark to 02:30 —
      // hour-0 and hour-1 windows (ends 01:00, 02:00) close and emit, with
      // their state evicted
      mem.addData((h(4, 30), "a"))
      q.processAllAvailable()
      val afterClose = spark.table("late_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(afterClose == Set((0L, "a", 2L), (1L, "a", 1L)),
        s"closed-window emission wrong: $afterClose")
      // batch 3: a LATE row for hour 0 — older than the 02:30 watermark —
      // must be DROPPED (state already evicted; no re-emission, no count
      // change), and the engine must record the drop
      mem.addData((h(0, 40), "a"))
      q.processAllAvailable()
      assert(spark.table("late_test").count() == 2, "late row changed the output")
      val dropped = q.recentProgress
        .flatMap(p => p.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1, s"engine did not record a watermark drop (dropped=$dropped)")
      // batch 4: advancing the watermark past hour 4 closes that window
      // with the on-time count only; hour 9 stays open (never emitted)
      mem.addData((h(9), "a"))
      q.processAllAvailable()
      val fin = spark.table("late_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(fin.sorted == Seq((0L, "a", 2L), (1L, "a", 1L), (4L, "a", 1L)),
        s"final append log wrong: $fin")
    } finally {
      q.stop()
      spark.catalog.dropTempView("late_test")
    }
  }

  test("stateful LWW dedup stream converges to the batch max per key") {
    val q = StreamingValidation.lwwDedupStream(spark, sfDir)
      .writeStream.outputMode("update")
      .format("memory").queryName("stream_lww")
      .start()
    try q.processAllAvailable() finally q.stop()

    // update mode may emit a key several times; the LAST emission per key
    // must equal the batch max(event_id) per user_id
    val emitted = spark.table("stream_lww").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(emitted.nonEmpty)
    val last = emitted.zipWithIndex
      .groupBy(_._1._1).map { case (k, vs) => k -> vs.maxBy(_._2)._1._2 }
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").agg(max("event_id").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(last == batch,
      s"diff: ${last.toSet.diff(batch.toSet).take(3)} / ${batch.toSet.diff(last.toSet).take(3)}")
  }

  test("LWW state TTL: a stale key is evicted and re-emits as new on reappearance") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val ss: SparkSession = spark
    val mem = MemoryStream[(Long, Long, Long)] // (user_id, event_id, epoch sec)
    val in = mem.toDF().toDF("user_id", "event_id", "sec")
      .select(col("user_id"), col("event_id"), timestamp_seconds(col("sec")).as("ts"))
    val q = StreamingValidation.lwwDedupTransform(in, retentionMs = 3600 * 1000L)
      .writeStream.outputMode("update").format("memory").queryName("lww_ttl").start()
    def h(hours: Long): Long = hours * 3600
    def emitted(): Seq[(Long, Long)] =
      spark.table("lww_ttl").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    try {
      // batch 1: key 1 @ hour 1, id 100 — emitted; TTL armed at 02:00
      // (hour 1, not 0: the initial watermark is 0 and the stateful-op
      // late filter drops rows with ts <= watermark, so an epoch-0 event
      // would never reach the state function)
      mem.addData((1L, 100L, h(1)))
      q.processAllAvailable()
      assert(emitted().contains((1L, 100L)))
      // batch 2: key 2 @ hour 12 — after this batch the watermark advances
      // to 10:00, past key 1's 02:00 TTL
      mem.addData((2L, 7L, h(12)))
      q.processAllAvailable()
      // batch 3: more key-2 data; key 1 has NO data this batch and its TTL
      // has expired, so the timeout path fires (hasTimedOut) and REMOVES
      // key 1's state
      mem.addData((2L, 8L, h(12)))
      q.processAllAvailable()
      // batch 4: key 1 reappears with a SMALLER id (50 < the evicted 100)
      // at an on-time ts. With the state cell gone it re-emits as NEW —
      // the pre-TTL NoTimeout state (still holding 100) would have
      // suppressed exactly this emission, so (1,50) in the log is the
      // observable proof the TTL dropped the state (the round-5 ask: the
      // TTL changes state size, never the kept answer — a downstream
      // converged reduce still keeps max=100)
      mem.addData((1L, 50L, h(12)))
      q.processAllAvailable()
      assert(emitted().contains((1L, 50L)),
        s"stale key did not re-emit after TTL eviction: ${emitted()}")
      // converged reduce over the emission log is unchanged by the TTL
      val converged = emitted().groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      assert(converged == Map(1L -> 100L, 2L -> 8L), s"converged state wrong: $converged")
    } finally {
      q.stop()
      spark.catalog.dropTempView("lww_ttl")
    }
  }

  test("st_lww (driver-oracle surface) converges to the batch max per key") {
    val got = StreamingValidation.lwwDedupBatch(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").agg(max("event_id").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == batch,
      s"diff: ${got.toSet.diff(batch.toSet).take(3)} / ${batch.toSet.diff(got.toSet).take(3)}")
  }

  test("st_windowed (driver-oracle surface) equals the full batch aggregation") {
    // the run-to-completion surface uses Trigger.AvailableNow + complete
    // mode, so EVERY window must be present (unlike the append-mode test
    // above, which only sees watermark-closed windows)
    val got = StreamingValidation.windowedVerdictsBatch(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    val m = col("event_id") % 5
    val malformed = when(m === 0, rtrim(col("props"), "}"))
      .when(m === 1, replace(col("props"), lit("\""), lit("'")))
      .when(m === 2, concat(lit("```json\n"), col("props"), lit("\n```")))
      .when(m === 3, replace(col("props"), lit("}"), lit(",}")))
      .otherwise(col("props"))
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        floor(unix_timestamp(col("ts").cast("timestamp")) / 3600).cast("long").as("hour_id"),
        col("event_type"),
        graft.functions.JsonRepairFunctions.jsonStrictValid(spark, malformed).as("valid"))
      .groupBy("hour_id", "event_type")
      .agg(count(lit(1)).as("n_rows"), count(when(!col("valid"), lit(1))).as("n_invalid"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

    assert(got.nonEmpty && got == batch,
      s"diff: ${got.diff(batch).take(3)} / ${batch.diff(got).take(3)}")
  }
}
