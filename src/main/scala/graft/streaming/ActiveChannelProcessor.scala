package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming gap alert: one emitted row per sampling hole. `open = true`
  * rows (gap_end = -1) are raised by the event-time timer at
  * `lastSeen + gap` — output only streaming can produce, because it fires
  * when data does NOT arrive. Closed rows carry (gap_start, gap_end) per
  * CONSECUTIVE sample pair spaced more than `gap` apart — the same
  * intervals the batch gap report
  * ([[graft.operators.TrendOps.gapReport]]) computes on replay, whether
  * the hole spans micro-batches or falls entirely inside one. A late
  * sample landing inside an open gap closes it silently (at event time
  * the hole was smaller than the alert suggested; if the silence then
  * persists, the re-armed timer opens it again). */
final case class GapAlert(metric: String, gap_start: Long, gap_end: Long, open: Boolean)

/** The [[GapAlert]] processor: `lastSeen` + an open-gap flag per metric.
  * Samples process in event-time order; every consecutive spacing beyond
  * the bound emits a closed row. An expired timer opens a gap but KEEPS
  * `lastSeen` so the closing row reports the hole's true start. */
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
    val sortedTs = rows.map(_.ts.getTime).toArray.sorted
    val hadState = lastSeen.exists()
    val wasOpen = hadState && gapOpen.exists() && gapOpen.get()
    // An un-fired timer from the previous arrival is superseded below;
    // after an OPEN alert no timer is pending.
    if (hadState && !wasOpen)
      getHandle.deleteTimer(lastSeen.get() + gapSeconds * 1000L)
    val out = Array.newBuilder[GapAlert]
    var prev = if (hadState) lastSeen.get() else Long.MinValue
    sortedTs.foreach { t =>
      if (prev != Long.MinValue && t - prev > gapSeconds * 1000L)
        out += GapAlert(metric, prev / 1000L, t / 1000L, open = false)
      prev = math.max(prev, t)
    }
    lastSeen.update(prev)
    gapOpen.update(false)
    getHandle.registerTimer(prev + gapSeconds * 1000L)
    out.result().iterator
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

/** A7 active-channel tracking as a [[StatefulProcessor]] (the
  * `transformWithState` arbitrary-state API): per-channel `lastSeen`
  * timestamp state plus one event-time timer at `lastSeen + gap`. Activity
  * re-arms the timer (the previous one is deleted); when the watermark
  * passes an armed timer the channel is evicted and an `active = false`
  * update emitted — the reference's inactivity cutoff
  * (trend-o-meter:521-525,470-478) with real event-time semantics. */
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
