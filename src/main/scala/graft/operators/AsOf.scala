package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: match every left row to the single most recent right row
 * whose timestamp is <= the left row's, per key — the temporal lookup
 * every event pipeline needs (event → the profile/config/model version
 * that was live when the event happened). Named alongside range joins as
 * the canonical "operator Spark lacks"; DuckDB ships it natively as
 * `ASOF JOIN`, which is exactly what the q82 oracle uses, so the
 * implementation is graded against a reference engine's semantics rather
 * than a reimplementation of itself.
 *
 * Implementation choice (the scale-shape decision): NOT the union+window
 * trick. Sorting events and snapshots together and carrying the last
 * snapshot forward with a window puts the full event stream through a
 * per-key window — a 10^9-event hot key becomes one task. Instead the
 * right side is turned into validity INTERVALS (valid_from = its ts,
 * valid_to = the next version's ts via lead() — a window over the
 * SNAPSHOT table only, which is small per key by construction), and the
 * join is an equi-join on the key with a range residual:
 *
 *   left.key = right.key AND left.ts >= valid_from
 *                        AND (valid_to IS NULL OR left.ts < valid_to)
 *
 * Each left row matches EXACTLY ONE interval (intervals partition the
 * timeline per key), so the join emits |left| rows, never a pair
 * blow-up; the sort-merge execution streams events against the few
 * buffered intervals of their key, cost linear in events × versions-
 * per-key. Left rows older than their key's first version survive with
 * nulls (left outer), matching ASOF LEFT JOIN.
 *
 * `ts` columns must be a totally ordered orderable type; callers who
 * need sub-second parity with external engines should join on epoch
 * micros (`unix_micros`), not truncated seconds.
 */
object AsOf {

  /**
   * @param left      probe side (events)
   * @param right     version history (snapshots); few rows per key
   * @param keyCols   equi-join key column names (present on both sides)
   * @param leftTs    left timestamp column name
   * @param rightTs   right timestamp column name
   * Right's non-key, non-ts columns are appended to every left row
   * (null where no version was live yet).
   */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    require(keyCols.nonEmpty, "as-of join needs at least one key column")
    // the right side is renamed wholesale so the join resolves by unique
    // names — the caller may derive one side from the other (snapshots
    // computed FROM the event stream), which would otherwise trip Spark's
    // ambiguous-self-join check on df("col") references
    val p = "__asof_"
    require(!left.columns.exists(_.startsWith(p)),
      s"left side may not carry columns prefixed $p")
    // output carries left's columns plus right's payload under its
    // original names — a shared payload name would yield duplicate
    // output columns, so demand disjointness up front
    val clash = right.columns
      .filterNot(c => keyCols.contains(c) || c == rightTs)
      .toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"left and right payload column names must be disjoint; both carry " +
        clash.toSeq.sorted.mkString(", "))
    val renamedRight = right.columns.foldLeft(right)(
      (df, c) => df.withColumnRenamed(c, p + c))
    // interval-end bookkeeping column: deliberately NOT under the $p
    // prefix ("__asofvt", no trailing underscore) so no right column can
    // collide with it after prefixing — a right payload literally named
    // "valid_to" would otherwise be overwritten by the lead() below
    val vt = "__asofvt"
    // duplicate (key, ts) versions: lead() over a bare ts order would let
    // shuffle layout decide which duplicate gets the live interval (the
    // others get empty [ts, ts) ranges). A value-derived tiebreak makes
    // the winner a pure function of the DATA — identical rows still tie,
    // but then the attached payload is identical too
    val tiebreak = xxhash64(struct(renamedRight.columns.map(col): _*))
    val byKey = Window.partitionBy(keyCols.map(k => col(p + k)): _*)
      .orderBy(col(p + rightTs), tiebreak)
    val intervals = renamedRight
      .withColumn(vt, lead(col(p + rightTs), 1).over(byKey))
    val joinKeys = keyCols.map(k => col(k) === col(p + k))
    val inWindow = col(leftTs) >= col(p + rightTs) &&
      (col(vt).isNull || col(leftTs) < col(vt))
    val joined = left.join(intervals,
      joinKeys.reduce(_ && _) && inWindow, "left_outer")
    // keep left's columns + right's payload (drop right's key copies and
    // the interval bookkeeping), payload restored to its original names
    val rightPayload = right.columns
      .filterNot(c => keyCols.contains(c) || c == rightTs)
    joined.select(
      left.columns.map(col) ++
        rightPayload.map(c => col(p + c).as(c)): _*)
  }
}
