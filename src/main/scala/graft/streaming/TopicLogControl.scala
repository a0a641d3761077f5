package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.{C2, C2Response, TrendParams}
import graft.sources.TopicLogWriter

/** The reference's control lifecycle (SURVEY §3.3) end-to-end OVER THE
  * BROKER: `SUBSCRIBE c2chan → tokenize/dispatch → publish response →
  * append cmdlog` (trend-o-meter:265-272, 171-228, 247-248, 253-262) —
  * with the channel-log DSv2 playing the bus on both sides.
  *
  * The command channel is consumed as a genuine micro-batched stream
  * (checkpointed offsets: a restarted control loop resumes at the first
  * unprocessed command, never re-executing an applied `set`). Within a
  * micro-batch, commands fold over the param state in per-channel OFFSET
  * order — the broker's per-channel ordering is exactly what the reference
  * relies on from Redis pub/sub. Each command emits:
  *
  *   - one response line to `respChannel` (S7's PUBLISH; the reference's
  *     HSET last-value contract is the channel TAIL here by construction —
  *     an append-only log's newest line per command field IS the last
  *     value, which [[Sinks.lastValueSink]] models for keyed sinks), and
  *   - one audit JSON line to `cmdlogChannel` (S8's LPUSH shape:
  *     `{ts, valid, message, retVal}`, trend-o-meter:253-262).
  *
  * Control volumes are human-scale by contract, so the per-batch
  * `collect()` gathers COMMANDS (bytes typed by an operator), never data —
  * the same driver-side-control posture as [[graft.C2]] itself.
  *
  * `executor` plugs a [[LiveQueryController]] in (`Some(ctl.execute)`) so
  * a broker command re-renders a RUNNING analytic stream; the default
  * folds an internal param state (the batch `executeAndRerun` model).
  */
class TopicLogControl(
    spark: SparkSession,
    root: String,
    cmdChannel: String = "c2",
    respChannel: String = "c2resp",
    cmdlogChannel: String = "cmdlog",
    initial: TrendParams = TrendParams.default,
    executor: Option[String => C2Response] = None,
    checkpoint: Option[String] = None,
    maxCmdsPerBatch: Int = 10000) extends AutoCloseable {

  @volatile private var current: TrendParams = initial

  /** Param state after every command processed so far (internal-fold mode;
    * with an external `executor` the owner tracks its own state). */
  def params: TrendParams = current

  private def run(cmd: String): C2Response = executor match {
    case Some(f) => f(cmd)
    case None =>
      val r = C2.execute(cmd, current)
      if (r.ok && r.verb == "set") current = r.params
      r
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }

  private val ck = checkpoint.getOrElse(
    Files.createTempDirectory("graft_c2log_ck_").toString)

  // Replay-guard identity: stable across restarts of the SAME control
  // loop (same checkpoint), distinct across loops — a restarted query
  // re-delivers its in-flight micro-batch with the SAME batch id, and
  // the guard below must recognize it.
  private val ctlId = "ctl-" + Integer.toHexString(
    (root + "|" + cmdChannel + "|" + ck).hashCode)

  private val query: StreamingQuery =
    spark.readStream.format("topiclog")
      .option("path", root).option("pattern", cmdChannel).load()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Epoch guard BEFORE any side effect: a crash-replayed micro-batch
        // must neither re-execute commands (a second `set` against
        // already-mutated or external state) nor re-append response/audit
        // lines. Same marker mechanism as the DSv2 sink's exactly-once.
        if (!TopicLogWriter.epochSeen(root, ctlId, batchId)) {
          // ENFORCED human-scale contract (the lastValueSink posture): a
          // command batch beyond maxCmdsPerBatch is a mis-wired channel
          // (data feeding the control plane), and silently collecting it
          // would be a driver OOM — fail loudly instead.
          val cmds = batch.orderBy("offset").limit(maxCmdsPerBatch + 1)
            .collect().map(_.getAs[String]("value"))
          if (cmds.length > maxCmdsPerBatch)
            throw new IllegalStateException(
              s"TopicLogControl: batch $batchId carries more than " +
                s"$maxCmdsPerBatch commands on '$cmdChannel' — command " +
                "channels are human-scale by contract; this looks like a " +
                "data stream wired into the control plane")
          if (cmds.nonEmpty) {
            val now = System.currentTimeMillis() / 1000
            val out = cmds.map { cmd =>
              val r = run(cmd)
              val resp =
                s"""{"ok": ${r.ok}, "verb": "${esc(r.verb)}", "message": "${esc(r.message)}"}"""
              val audit =
                s"""{"ts": $now, "valid": ${r.ok}, "message": "${esc(cmd)}", "retVal": "${esc(r.message)}"}"""
              (resp, audit)
            }
            // One append per channel per batch (not per command): the splice
            // cost is per-publish, the contract is per-line. The marker
            // commits both channels together.
            TopicLogWriter.publishEpoch(root, ctlId, batchId, Seq(
              respChannel -> out.map(_._1).toSeq,
              cmdlogChannel -> out.map(_._2).toSeq))
          }
        }
        ()
      }
      .start()

  /** Drain every command currently in the log (test/demo convenience). */
  def processAllAvailable(): Unit = query.processAllAvailable()

  def close(): Unit = query.stop()
}
