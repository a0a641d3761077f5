package graft

import org.apache.spark.sql.DataFrame

import graft.operators.TrendOps

/** Result of one control-plane command: the (possibly updated) parameter
  * set plus the response payload the S7 sink would publish. */
final case class C2Response(ok: Boolean, verb: String, message: String, params: TrendParams)

/** C2 control plane (SURVEY §2.6, trend-o-meter:165-272): tokenize the
  * command (X9), dispatch get/set, apply parameter mutations, and re-trigger
  * the affected query with the new literals — the declarative analogue of
  * the reference's "mutate config, clear display, re-run A2"
  * (trend-o-meter:214-220).
  *
  * This is driver-side control logic by design (a parameter feed, not a data
  * path — SURVEY §7 "do not build a command bus"); the data-plane effect is
  * only ever "re-run a declarative query with new params".
  */
object C2 {

  /** Reference toBool semantics (trend-o-meter:196-205), control-plane copy
    * of [[graft.functions.Scalars.toBool]] — including its overflow-proof
    * truthiness: an integer string is true iff it contains a nonzero digit
    * (a long cast would THROW here on >64-bit integers, where the
    * reference's `Number(s)` is simply truthy). */
  private def toBool(s: String): Boolean =
    if (s.matches("^-?[0-9]+$")) s.exists(c => c >= '1' && c <= '9') else s == "true"

  private def renderConfig(p: TrendParams): String =
    s"""{"maxListQueryLength": ${p.maxListQueryLength},
       | "samplesPerMinuteRetained": ${p.samplesPerMinuteRetained},
       | "dayBins": [${p.dayBins.mkString(",")}],
       | "minDataHoursToRenderBin": ${p.minDataHoursToRenderBin},
       | "currentValueSamples": ${p.currentValueSamples},
       | "sessionGapSeconds": ${p.sessionGapSeconds}}""".stripMargin.replaceAll("\n", "")

  /** Execute one command against the current params. Never throws: unknown
    * or malformed commands return ok=false with the error message (the
    * reference logs and continues, trend-o-meter:440-443).
    *
    * `counters`: the live stream's [[graft.streaming.CounterListener]],
    * when one is attached — `get stats` then answers with the real
    * uptime / rx / batch / (re)start numbers (trend-o-meter:177-194)
    * instead of a pointer. [[graft.streaming.LiveQueryController]] wires
    * this automatically. */
  def execute(command: String, p: TrendParams,
              counters: Option[graft.streaming.CounterListener] = None,
              display: Option[graft.streaming.DisplayDevice] = None): C2Response = {
    if (command.trim.isEmpty)
      return C2Response(ok = false, "", "empty command", p)
    // X9: whitespace tokenize, head = verb (trend-o-meter:173,237).
    val toks = command.trim.split("\\s+").toList
    try toks match {
      case "get" :: "config" :: Nil =>
        C2Response(ok = true, "get", renderConfig(p), p)
      case "get" :: "stats" :: Nil =>
        // Display-uptime round-trip (trend-o-meter:180): ask the device,
        // degrade to -1 on any failure — logged-not-fatal, the
        // reference's own posture (trend-o-meter:181-183).
        val deviceUptime = display.map { d =>
          try d.issueCustomCommand("uptime")
          catch { case e: Exception =>
            System.err.println(s"error querying device uptime: ${e.getMessage}")
            "-1"
          }
        }.getOrElse("-1")
        C2Response(ok = true, "get",
          counters.map(_.statsJson(deviceUptime)).getOrElse(
            """{"note": "no live stream attached; rx/batches/reconnects live on streaming.CounterListener"}"""),
          p)
      case "set" :: "minDataHoursToRenderBin" :: v :: Nil =>
        C2Response(ok = true, "set", s"minDataHoursToRenderBin=$v",
          p.copy(minDataHoursToRenderBin = v.toInt))
      case "set" :: "currentValueSamples" :: v :: Nil =>
        C2Response(ok = true, "set", s"currentValueSamples=$v",
          p.copy(currentValueSamples = v.toInt))
      case "set" :: "samplesPerMinuteRetained" :: v :: Nil =>
        C2Response(ok = true, "set", s"samplesPerMinuteRetained=$v",
          p.copy(samplesPerMinuteRetained = v.toDouble))
      case "set" :: "maxListQueryLength" :: v :: Nil =>
        C2Response(ok = true, "set", s"maxListQueryLength=$v",
          p.copy(maxListQueryLength = v.toInt))
      case "set" :: "sessionGapSeconds" :: v :: Nil =>
        C2Response(ok = true, "set", s"sessionGapSeconds=$v",
          p.copy(sessionGapSeconds = v.toLong))
      case "set" :: "dayBins" :: v :: Nil =>
        // comma-separated ascending bin list, e.g. "set dayBins 1,3,5,7"
        C2Response(ok = true, "set", s"dayBins=$v",
          p.copy(dayBins = v.split(",").map(_.trim.toInt).toSeq))
      case "set" :: ("debug" | "logMsgs") :: v :: Nil =>
        // Diagnostics toggles: accepted, no analytic effect (X5 coercion).
        C2Response(ok = true, "set", s"${toks(1)}=${toBool(v)}", p)
      case verb :: _ =>
        C2Response(ok = false, verb, s"unknown command: $command", p)
      case Nil => // unreachable after the blank guard; kept for totality
        C2Response(ok = false, "", "empty command", p)
    } catch {
      case e: Exception =>
        C2Response(ok = false, toks.headOption.getOrElse(""), s"error: ${e.getMessage}", p)
    }
  }

  /** The reference's recompute-on-parameter-change: apply the command, then
    * re-run the flagship with the updated literals (trend-o-meter:214-220).
    * Only a SUCCESSFUL `set` re-runs — the reference recomputes after a
    * parameter mutation, not after reads or rejected commands, and on a
    * large series the re-run is a full scan+aggregate.
    * @return the response, plus the recomputed extents when the command
    *         mutated parameters (None otherwise). */
  def executeAndRerun(command: String, p: TrendParams,
                      series: DataFrame): (C2Response, Option[DataFrame]) = {
    val resp = execute(command, p)
    val rerun =
      if (resp.ok && resp.verb == "set") Some(TrendOps.bandedExtents(series, resp.params))
      else None
    (resp, rerun)
  }

  /** [[executeAndRerun]]'s STREAMING twin — the reference's
    * mutate-config-and-re-render against a RUNNING stream
    * (trend-o-meter:214-220): returns a
    * [[graft.streaming.LiveQueryController]] whose `execute` applies a
    * successful `set` to the live query via a managed checkpoint-preserving
    * restart (a Structured Streaming plan's literals are fixed at start,
    * so "re-render with new params" IS a rebuild — state and source
    * offsets carry over through the checkpoint, exactly the reference's
    * clear-display-and-recompute with history retained). `get stats`
    * answers from the controller's live counters. */
  def attachLive(
      build: TrendParams => DataFrame,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: String,
      initial: TrendParams = TrendParams.default,
      outputMode: String = "update",
      display: Option[graft.streaming.DisplayDevice] = None): graft.streaming.LiveQueryController =
    new graft.streaming.LiveQueryController(build, sink, checkpointDir, initial,
      outputMode, display)

  /** S5 command-stream shape: fold a (micro-)batch of commands over the
    * param state in arrival order, collecting the responses the S7/S8 sinks
    * would publish. Used from `foreachBatch` on a command stream. */
  def foldCommands(commands: Seq[String], p: TrendParams): (TrendParams, Seq[C2Response]) =
    commands.foldLeft((p, Vector.empty[C2Response])) { case ((cur, acc), cmd) =>
      val r = execute(cmd, cur)
      (r.params, acc :+ r)
    }
}
