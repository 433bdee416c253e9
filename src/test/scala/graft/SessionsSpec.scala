package graft

import graft.operators.Sessions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ev(rows: (Long, Long, Long)*) = rows.toDF("event_id", "user_id", "us")
    .select(col("event_id"), col("user_id"),
      timestamp_micros(col("us")).as("ts"))

  test("boundaries: first event opens; gap == gapSec opens (end-exclusive, " +
      "session_window semantics); gap < gapSec continues") {
    val g = 100L // seconds
    val got = Sessions.sessionize(
      ev((1L, 1L, 0L), (2L, 1L, 99999999L), // 99.999999s < 100s → same
        (3L, 1L, 200000000L),               // exactly 100s after #2 → NEW
        (4L, 1L, 200000001L),               // 1us after → same
        (5L, 2L, 0L)),                      // other key
      "user_id", "ts", "event_id", g)
      .select(col("event_id"), col("session_index"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L), got)
  }

  test("summarize: counts, bounds, durations; parallelism-invariant") {
    val rows = (0L until 600L).map(i =>
      (i, i % 7, i * 40000000L)) // per-user spacing 7*40s = 280s
    def run(parts: Int) = Sessions.summarize(
      ev(rows: _*).repartition(parts), "user_id", "ts", "event_id", 300L)
      .orderBy("user_id", "session_index")
      .collect().map(_.toString).toSeq
    val a = run(1)
    assert(a == run(13))
    assert(a.nonEmpty)
  }

  test("parity with Spark's NATIVE session_window aggregation on " +
      "generic (tie-free) data") {
    val rows = (0L until 500L).map { i =>
      // pseudo-random per-user spacing, no exact-gap ties
      (i, i % 5, i * 33333337L + (i % 11) * 77L)
    }
    val df = ev(rows: _*)
    val native = df.groupBy(col("user_id"), session_window(col("ts"), "200 seconds"))
      .agg(count(lit(1)).as("n_events"), min("ts").as("session_start"))
      .select("user_id", "session_start", "n_events")
      .collect().map(_.toString).sorted
    val ours = Sessions.summarize(df, "user_id", "ts", "event_id", 200L)
      .select("user_id", "session_start", "n_events")
      .collect().map(_.toString).sorted
    assert(native.sameElements(ours))
  }

  test("streaming twin: session_window over a MemoryStream reaches the " +
      "same closed sessions as the batch form") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val stream = input.toDF().toDF("event_id", "user_id", "us")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("us")).as("ts"))
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "100 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("sessout").start()
    try {
      val rows = (0L until 120L).map(i => (i, i % 3, i * 45000000L))
      input.addData(rows: _*)
      q.processAllAvailable()
      // advance the watermark far past the last session so it closes
      input.addData((999L, 99L, 10_000_000_000_000L))
      q.processAllAvailable()
      val streamed = spark.table("sessout")
        .where(col("user_id") < 3)
        .collect().map(_.toString).sorted
      val batch = Sessions.summarize(ev(rows: _*), "user_id", "ts", "event_id", 100L)
        .select(col("user_id"), col("session_start"), col("n_events"))
        .collect().map(_.toString).sorted
      assert(streamed.sameElements(batch),
        s"streamed=${streamed.length} batch=${batch.length}")
    } finally q.stop()
  }
}
