package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.{C2, C2Response, TrendParams}

/** Live parameter push into a RUNNING streaming query (§2.6, the
  * reference's mutate-and-re-render loop, trend-o-meter:214-220) via the
  * MANAGED-RESTART pattern: a Structured Streaming plan's literals are
  * fixed when the query starts, so the Spark-native way to change a
  * parameter mid-stream is to stop the query at a micro-batch boundary and
  * restart the rebuilt plan on the SAME checkpoint — source offsets and
  * stateful-operator state recover, so the stream resumes where it left
  * off with the new literals (the reference's clear-display-and-recompute,
  * with history retained by the checkpoint instead of Redis).
  *
  * Why restart, not a mutable broadcast: a `set` can change plan SHAPE
  * (`dayBins` changes the banding literals and bin count; `sessionGap`
  * changes a state timeout), which no in-flight variable refresh can
  * express — while a restart handles every parameter uniformly and leans
  * on the engine's own recovery contract. The cost is one micro-batch
  * boundary's latency per `set`; command rates are human-scale.
  *
  * Restart semantics note: checkpoint recovery is Spark's standard
  * at-least-once contract — an uncommitted final micro-batch is re-run
  * after restart, and a changed plan resumes against the retained state.
  * Parameters that alter a stateful operator's STATE SCHEMA (not just
  * literals) need a fresh checkpoint; the reference's tunables all map to
  * literals/timeouts, which recover cleanly.
  *
  * Construct via [[graft.C2.attachLive]]. The controller owns a
  * [[CounterListener]] for its whole lifetime (restarts keep counting —
  * query (re)starts ARE the reference's `reconnects[]`), so `get stats`
  * composes live numbers.
  *
  * @param build      params → the streaming result frame (plan factory)
  * @param sink       per-micro-batch consumer (`foreachBatch` body)
  * @param checkpointDir checkpoint location shared across restarts
  */
class LiveQueryController(
    build: TrendParams => DataFrame,
    sink: (DataFrame, Long) => Unit,
    checkpointDir: String,
    initial: TrendParams = TrendParams.default,
    outputMode: String = "update",
    display: Option[DisplayDevice] = None) extends AutoCloseable {

  /** A8 counters, controller-scoped: uptime is the controller's, and each
    * managed restart lands in `starts` — the reconnect log. */
  val counters = new CounterListener

  @volatile private var current: TrendParams = initial
  @volatile private var query: StreamingQuery = null

  private def startQuery(df: DataFrame): StreamingQuery =
    df.writeStream
      .outputMode(outputMode)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(sink)
      .start()

  // Listener first: the initial start must land in `starts` too.
  locally {
    val first = build(initial)
    first.sparkSession.streams.addListener(counters)
    query = startQuery(first)
  }

  def params: TrendParams = current
  def active: StreamingQuery = query

  /** Execute one C2 command against the live stream. A successful `set`
    * that changes the params restarts the query on the shared checkpoint;
    * reads (`get ...`), no-op sets, and rejected commands leave it
    * running untouched (the reference only re-renders after a mutation). */
  def execute(command: String): C2Response = synchronized {
    val r = C2.execute(command, current, Some(counters), display)
    if (r.ok && r.verb == "set" && r.params != current) {
      current = r.params
      query.stop()
      query = startQuery(build(current))
    }
    r
  }

  /** Drain everything currently available (test/demo convenience). */
  def processAllAvailable(): Unit = query.processAllAvailable()

  def close(): Unit = {
    val s = query.sparkSession
    try query.stop()
    finally s.streams.removeListener(counters)
  }
}
