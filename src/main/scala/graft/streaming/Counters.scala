package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener

/** A8 running counters (trend-o-meter:128-132,186-192,486-489): message
  * rx/batch counts, uptime, and reconnect timestamps — surfaced the Spark
  * way, as a `StreamingQueryListener` instead of ad-hoc globals. Attach with
  * `spark.streams.addListener(counters)`. */
class CounterListener extends StreamingQueryListener {
  private val startedAtMs = System.currentTimeMillis()
  private val rxRows = new AtomicLong
  private val batchCount = new AtomicLong
  private val queryStarts = new ConcurrentLinkedQueue[String]()
  private val terminations = new AtomicLong

  override def onQueryStarted(event: StreamingQueryListener.QueryStartedEvent): Unit =
    queryStarts.add(event.timestamp)

  override def onQueryProgress(event: StreamingQueryListener.QueryProgressEvent): Unit = {
    rxRows.addAndGet(event.progress.numInputRows)
    batchCount.incrementAndGet()
  }

  override def onQueryTerminated(event: StreamingQueryListener.QueryTerminatedEvent): Unit =
    terminations.incrementAndGet()

  def totalRowsReceived: Long = rxRows.get
  def totalBatches: Long = batchCount.get
  /** Query (re)start timestamps — the reference's `reconnects[]` analogue. */
  def starts: Seq[String] = queryStarts.asScala.toSeq
  def uptimeMs: Long = System.currentTimeMillis() - startedAtMs

  /** `get stats` payload (C2 §2.6). `displayUptime` is the display
    * device's own answer to the uptime round-trip (trend-o-meter:180's
    * `issueCustomCommand('uptime')`), `-1` when no device is attached or
    * the query failed — the reference's exact degrade value. */
  def statsJson(displayUptime: String = "-1"): String = {
    // the device answer is free-form by contract — embed it raw only when
    // it is a number, else JSON-quote it so the payload stays parseable
    val dev =
      if (displayUptime.matches("-?\\d+(\\.\\d+)?")) displayUptime
      else "\"" + displayUptime.flatMap {
        case '"'          => "\\\""
        case '\\'         => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c            => c.toString
      } + "\""
    s"""{"uptime_ms": $uptimeMs, "display_uptime": $dev,
       | "rx_rows": $totalRowsReceived,
       | "batches": $totalBatches, "starts": ${starts.size},
       | "terminated": ${terminations.get}}""".stripMargin.replaceAll("\n", "")
  }
}

/** The display adapter's command surface (trend-o-meter:180's
  * `displayRef.issueCustomCommand`): free-form command in, string answer
  * out. `get stats` uses it for the device-uptime round-trip; a throwing
  * device is logged-and-degraded, never fatal (trend-o-meter:181-183). */
trait DisplayDevice {
  def issueCustomCommand(cmd: String): String
}

/** An in-memory display device: answers `uptime` with whole seconds since
  * construction — the test/console twin of the reference's physical
  * display adapter. */
class BufferDisplay extends DisplayDevice {
  private val t0 = System.currentTimeMillis()
  def issueCustomCommand(cmd: String): String = cmd match {
    case "uptime" => ((System.currentTimeMillis() - t0) / 1000).toString
    case other    => throw new IllegalArgumentException(s"unknown device command: $other")
  }
}
