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
    * of [[graft.functions.Scalars.toBool]]. */
  private def toBool(s: String): Boolean =
    if (s.matches("^-?[0-9]+$")) s.toLong != 0 else s == "true"

  private def renderConfig(p: TrendParams): String =
    s"""{"maxListQueryLength": ${p.maxListQueryLength},
       | "samplesPerMinuteRetained": ${p.samplesPerMinuteRetained},
       | "dayBins": [${p.dayBins.mkString(",")}],
       | "minDataHoursToRenderBin": ${p.minDataHoursToRenderBin},
       | "currentValueSamples": ${p.currentValueSamples},
       | "sessionGapSeconds": ${p.sessionGapSeconds}}""".stripMargin.replaceAll("\n", "")

  /** Execute one command against the current params. Never throws: unknown
    * or malformed commands return ok=false with the error message (the
    * reference logs and continues, trend-o-meter:440-443). */
  def execute(command: String, p: TrendParams): C2Response = {
    if (command.trim.isEmpty)
      return C2Response(ok = false, "", "empty command", p)
    // X9: whitespace tokenize, head = verb (trend-o-meter:173,237).
    val toks = command.trim.split("\\s+").toList
    try toks match {
      case "get" :: "config" :: Nil =>
        C2Response(ok = true, "get", renderConfig(p), p)
      case "get" :: "stats" :: Nil =>
        C2Response(ok = true, "get",
          """{"note": "rx/batches/reconnects live on streaming.CounterListener"}""", p)
      case "set" :: "minDataHoursToRenderBin" :: v :: Nil =>
        C2Response(ok = true, "set", s"minDataHoursToRenderBin=$v",
          p.copy(minDataHoursToRenderBin = v.toInt))
      case "set" :: "currentValueSamples" :: v :: Nil =>
        C2Response(ok = true, "set", s"currentValueSamples=$v",
          p.copy(currentValueSamples = v.toInt))
      case "set" :: "samplesPerMinuteRetained" :: v :: Nil =>
        C2Response(ok = true, "set", s"samplesPerMinuteRetained=$v",
          p.copy(samplesPerMinuteRetained = v.toDouble))
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
    */
  def executeAndRerun(command: String, p: TrendParams, series: DataFrame): (C2Response, DataFrame) = {
    val resp = execute(command, p)
    (resp, TrendOps.bandedExtents(series, resp.params))
  }

  /** S5 command-stream shape: fold a (micro-)batch of commands over the
    * param state in arrival order, collecting the responses the S7/S8 sinks
    * would publish. Used from `foreachBatch` on a command stream. */
  def foldCommands(commands: Seq[String], p: TrendParams): (TrendParams, Seq[C2Response]) =
    commands.foldLeft((p, Vector.empty[C2Response])) { case ((cur, acc), cmd) =>
      val r = execute(cmd, cur)
      (r.params, acc :+ r)
    }
}
