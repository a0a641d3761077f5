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
