package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream relational primitives the engine's `events` family
  * builds on. The centerpiece is the AS-OF join — the time-series
  * operator Spark has no native form of (the brief's canonical
  * example): each left row matched to the single right row with the
  * greatest right time ≤ the left time, per key.
  */
object Events {

  /** Binned RANGE join — point-in-interval per key, the other
    * classic operator Spark lacks natively (a bare range predicate
    * plans as a nested-loop cross join): intervals explode into
    * fixed-width time bins, each point lands in exactly ONE bin, the
    * join becomes an EQUI-join on (key, bin), and the exact
    * containment filter runs after. A qualifying (point, interval)
    * pair surfaces exactly once — the point's single bin — so no
    * dedup pass is needed. `binWidth` trades interval fan-out
    * (⌈len/W⌉+1 rows per interval) against bin selectivity; pick ≈
    * the typical interval length. Times must be non-negative
    * integers (`div` binning). Interval columns come back prefixed.
    *
    * Scale shape: one equi-join keyed on (key, bin) — shuffles
    * partition by the join key like any aggregation; a hot (key,
    * bin) means genuinely overlapping mass, the problem's intrinsic
    * output size, not an artifact. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, key: String,
      t: String, lo: String, hi: String, binWidth: Long,
      prefix: String = "iv_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pB = points.withColumn("__bin", expr(s"$t div ${binWidth}L"))
    val iB = binIntervals(intervals, key, lo, hi, binWidth, prefix)
    pB.join(iB, Seq(key, "__bin"))
      .filter(col(t) >= col(s"$prefix$lo") && col(t) <= col(s"$prefix$hi"))
      .drop("__bin")
  }

  /** The interval side of [[rangeJoin]]'s binning, exposed so the
    * stream-static form can pre-explode intervals ONCE batch-side
    * (the at-rest fan-out) and share the exact layout with the batch
    * join — one home, no drift. */
  def binIntervals(intervals: DataFrame, key: String, lo: String,
      hi: String, binWidth: Long, prefix: String = "iv_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val iCols = intervals.columns.filterNot(_ == key).toSeq
    intervals
      .withColumn("__bin", explode(sequence(
        expr(s"$lo div ${binWidth}L"), expr(s"$hi div ${binWidth}L"))))
      .select((col(key) +: col("__bin") +:
        iCols.map(c => col(c).as(s"$prefix$c"))): _*)
  }

  /** The static-side prep for the STREAMING as-of form (VERDICT r10
    * #5): each right row becomes its VALIDITY interval — the half-open
    * span during which it is "the latest prior row" for its key —
    * via ONE keyed lead() window: `[t_i, t_{i+1} - 1]`, the last row
    * per key closing at `horizon` (a static reference timeline is
    * bounded, so its serving horizon is a known scalar). An as-of
    * lookup is then a point-in-interval RANGE join: intervals
    * partition each key's timeline, so a live point lands in exactly
    * ONE interval = its as-of match — which turns the unbounded-state
    * streaming as-of into [[binIntervals]] + the stateless
    * stream-static equi-join [[graft.streaming.StreamOps
    * .streamingRangeJoin]] already uses. Right rows tied at one
    * (key, time) instant order by payload: every tied row except the
    * largest-payload one gets an EMPTY interval (lo > hi, dropped
    * here), reproducing [[asofJoin]]'s deterministic tie-break
    * exactly. Returns (key, lo, hi, rightVals..., time). */
  def asofValidityIntervals(right: DataFrame, key: String, time: String,
      rightVals: Seq[String], horizon: Long): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, struct(rightVals.map(col): _*).asc)
    right
      .withColumn("__hi", coalesce(lead(col(time), 1).over(w) - 1, lit(horizon)))
      .filter(col(time) <= col("__hi"))
      .select((col(key) +: col(time).as("lo") +: col("__hi").as("hi") +:
        (rightVals :+ time).map(c => col(c))): _*)
  }

  /** AS-OF join, composed from built-ins (no custom plan node
    * needed): tag both sides, union, and carry the latest right row
    * forward with `last(_, ignoreNulls) OVER (PARTITION BY key ORDER
    * BY time, side, payload ROWS UNBOUNDED PRECEDING)` — right rows
    * sort BEFORE left rows at equal time, so the match is inclusive
    * (right.time ≤ left.time), the DuckDB `ASOF JOIN ... ON l.t >=
    * r.t` semantics. The carried payload is ONE struct per right
    * row, so a match is always a consistent single row even when
    * some right columns are null. Left rows with no prior right row
    * keep null match columns (LEFT-join semantics).
    *
    * Scale shape: one union + ONE keyed window (partitioned by
    * `key`, running frame — a streaming aggregate, no whole-partition
    * sort buffer beyond the key group). Never a per-left-row
    * subquery, never a range cross-join: cost is the per-key event
    * volume, which is the as-of problem's intrinsic grain. A key
    * whose history exceeds one task's memory needs time-bucketed
    * pre-splitting — out of contract here, as in every keyed-window
    * operator in this engine.
    *
    * Determinism (ADVICE r10): right-side rows tied at one (key,
    * time) instant are ordered by their payload struct ascending, so
    * `last` deterministically carries the LARGEST payload among the
    * ties — a total tie-break with no fixture-uniqueness assumption
    * (the previous contract pushed tied clocks to the caller).
    * Requires `rightVals` columns to be orderable types (no maps) —
    * true of every relational payload this engine emits. Engines
    * differ on WHICH tied row an as-of picks (DuckDB's native ASOF
    * is itself unspecified under ties), so cross-engine gates should
    * still prefer tie-free fixtures; within THIS engine the result
    * is now stable under any plan or partitioning change. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      time: String, rightVals: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.toSeq
    val payload = struct(
      (rightVals.map(col) :+ col(time).as("__t")): _*)
    val rU = right.select(col(key), col(time), lit(0).as("__side"),
      payload.as("__r"))
    val payloadType = rU.schema("__r").dataType
    val lU = left.select(
      (lCols.map(col) :+ lit(1).as("__side") :+
        lit(null).cast(payloadType).as("__r")): _*)
    val rAligned = rU.select(
      (lCols.map(c =>
        if (c == key) col(key)
        else if (c == time) col(time)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__side") :+ col("__r")): _*)
    // __r asc as the final key: right rows tied at (key, time) order
    // by payload, so `last` picks the largest payload deterministically
    // (left rows all carry null __r — their relative order is
    // irrelevant, every right row at time <= t precedes them)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rAligned)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((lCols.map(col) ++
        rightVals.map(v => col(s"__m.$v").as(s"$prefix$v")) :+
        col("__m.__t").as(s"$prefix$time")): _*)
  }
}
