package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** A7 active-channel tracking as a [[StatefulProcessor]] (the
  * `transformWithState` arbitrary-state API): per-channel `lastSeen`
  * timestamp state plus one event-time timer at `lastSeen + gap`. Activity
  * re-arms the timer (the previous one is deleted); when the watermark
  * passes an armed timer the channel is evicted and an `active = false`
  * update emitted — the reference's inactivity cutoff
  * (trend-o-meter:521-525,470-478) with real event-time semantics. */
/** Streaming gap alert: one emitted row per sampling hole, from the side
  * that only streaming can see — the timer fires when data does NOT
  * arrive. `open = true` rows (gap_end = -1) are raised by the event-time
  * timer at `lastSeen + gap`; when the metric resumes, a closing row
  * carries the full (gap_start, gap_end) — the same interval the batch
  * gap report ([[graft.operators.TrendOps.gapReport]]) computes on replay. */
final case class GapAlert(metric: String, gap_start: Long, gap_end: Long, open: Boolean)

/** The [[GapAlert]] processor: `lastSeen` + an open-gap flag per metric.
  * Activity re-arms the timer; an expired timer opens a gap but KEEPS
  * `lastSeen` so the closing row can report the hole's true extent. */
final class GapAlertProcessor(gapSeconds: Long)
    extends StatefulProcessor[String, StreamSample, GapAlert] {

  @transient private var lastSeen: ValueState[Long] = _
  @transient private var gapOpen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)
    gapOpen = getHandle.getValueState[Boolean]("gapOpen", Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(
      metric: String,
      rows: Iterator[StreamSample],
      timerValues: TimerValues): Iterator[GapAlert] = {
    val incoming = rows.map(_.ts.getTime).max
    val closed: Iterator[GapAlert] =
      if (lastSeen.exists() && gapOpen.exists() && gapOpen.get()) {
        val start = lastSeen.get()
        if (incoming > start)
          Iterator(GapAlert(metric, start / 1000L, incoming / 1000L, open = false))
        else Iterator.empty
      } else {
        // un-fired timer from the previous arrival (if any) is re-armed below
        if (lastSeen.exists())
          getHandle.deleteTimer(lastSeen.get() + gapSeconds * 1000L)
        Iterator.empty
      }
    val maxMs = if (lastSeen.exists()) math.max(lastSeen.get(), incoming) else incoming
    lastSeen.update(maxMs)
    gapOpen.update(false)
    getHandle.registerTimer(maxMs + gapSeconds * 1000L)
    closed
  }

  override def handleExpiredTimer(
      metric: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[GapAlert] = {
    val last = if (lastSeen.exists()) lastSeen.get() else 0L
    gapOpen.update(true) // keep lastSeen: the closing row needs it
    Iterator(GapAlert(metric, last / 1000L, -1L, open = true))
  }
}

final class ActiveChannelProcessor(gapSeconds: Long)
    extends StatefulProcessor[String, StreamSample, ChannelUpdate] {

  @transient private var lastSeen: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastSeen = getHandle.getValueState[Long]("lastSeen", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      source: String,
      rows: Iterator[StreamSample],
      timerValues: TimerValues): Iterator[ChannelUpdate] = {
    val incoming = rows.map(_.ts.getTime).max
    val maxMs =
      if (lastSeen.exists()) {
        getHandle.deleteTimer(lastSeen.get() + gapSeconds * 1000L)
        math.max(lastSeen.get(), incoming)
      } else incoming
    lastSeen.update(maxMs)
    getHandle.registerTimer(maxMs + gapSeconds * 1000L)
    Iterator(ChannelUpdate(source, active = true, maxMs / 1000L))
  }

  override def handleExpiredTimer(
      source: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ChannelUpdate] = {
    val last = if (lastSeen.exists()) lastSeen.get() else 0L
    lastSeen.clear()
    Iterator(ChannelUpdate(source, active = false, last / 1000L))
  }
}
