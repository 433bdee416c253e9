package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sessionization: group each key's event stream into sessions separated
 * by inactivity gaps — the canonical gaps-and-islands analysis every
 * event pipeline needs (crawl politeness windows, user visits, bot-run
 * detection over the `events` table).
 *
 * Batch form: a per-key window computes the gap to the previous event
 * (`lag`), a boundary flag where the gap exceeds `gapSec`, and the
 * running sum of boundaries as the 1-based session index — exactly the
 * DuckDB replay the q89 oracle runs. Sessionization is inherently
 * sequential PER KEY (each event's session depends on every earlier
 * event of its key), so the per-key window is the honest shape: the
 * partition is bounded by one key's event count, the same justification
 * as the winnowing/span windows. A key with 10^9 events is a data-model
 * smell (that's a bot — cap upstream), not a reason to fake parallelism
 * that changes the semantics.
 *
 * Streaming twin: Spark's native `session_window(ts, gap)` aggregation —
 * StreamingSessionsSpec pins that the streaming session boundaries equal
 * this batch form's on the same input.
 */
object Sessions {

  /** Adds `session_index` (1-based per key, in `tsCol` order with a
    * deterministic `tieCol` tiebreak) to every event row. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame = {
    require(gapSec > 0, s"gap must be positive, got $gapSec")
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val ts = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(ts, 1).over(byKey)
    // >= (not >): a session window is [start, last + gap) end-EXCLUSIVE,
    // so an event exactly `gap` after its predecessor opens a new session
    // — matching Spark's native session_window, which the streaming twin
    // uses (SessionsSpec pins the parity)
    val boundary = when(
      prev.isNull || ts - prev >= gapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_index",
      sum(boundary).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session summary: first/last event time, event count, duration —
    * the session table most downstream joins want. */
  def summarize(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame =
    sessionize(df, keyCol, tsCol, tieCol, gapSec)
      .groupBy(col(keyCol), col("session_index"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol)).cast("timestamp")) -
          unix_micros(min(col(tsCol)).cast("timestamp"))).as("duration_us"))
}
