package graft

/** Query parameters of the trend engine.
  *
  * Mirrors the reference's runtime-tunable config tree
  * (`config/default.json:1-28`): every "query" in the reference is code
  * parameterised by these values, so here they become a plain case class
  * passed to the operator constructors. Runtime mutation of a parameter
  * (reference C2 `set`, `trend-o-meter:214-227`) maps to re-running the
  * declarative query with new literals.
  */
final case class TrendParams(
    /** Bound on the history scan (`config/default.json:6`, LRANGE limit at
      * `trend-o-meter:289`). */
    maxListQueryLength: Int = 14400,
    /** Retained sample density: 1/min default → 60 s min gap between kept
      * samples (`config/default.json:15`, used at `trend-o-meter:137`). */
    samplesPerMinuteRetained: Double = 1.0,
    /** Trailing day bins for the banded extents query
      * (`config/default.json:16`, consumed at `trend-o-meter:19`). Must be
      * ascending. */
    dayBins: Seq[Int] = Seq(1, 3, 5, 7),
    /** Completeness gate: a band renders only when its data span in hours
      * exceeds this (`config/default.json:17`, `trend-o-meter:59`). */
    minDataHoursToRenderBin: Int = 18,
    /** "Current value" = mean of the newest N samples
      * (`config/default.json:19`, `trend-o-meter:369-371`). */
    currentValueSamples: Int = 30,
    /** Stream-rate metric window width in seconds (reference
      * `redisPubSubMetrics.mpsWindowSizeSeconds`, `trend-o-meter:463-466`). */
    rateWindowSeconds: Int = 60,
    /** Channel-inactivity eviction cutoff (A7 sessions,
      * `trend-o-meter:521-525`). Doubles as the batch sessionization gap. */
    sessionGapSeconds: Long = 1800L,
    /** Micro-batch width for the stream mean (A4). The reference's batch is
      * "everything since the last processed sample" (`trend-o-meter:391`);
      * our batch analogue is a tumbling window of this many seconds. */
    microBatchSeconds: Int = 300,
    /** Display column width for the rendered current value
      * (`config/default.json:14`). */
    mainMetricWidth: Int = 4
) {
  require(dayBins == dayBins.sorted, "dayBins must be ascending")
  /** Minimum seconds between retained samples (`trend-o-meter:137`). */
  def minSampleGapSeconds: Double = 60.0 / samplesPerMinuteRetained
  /** Retention horizon = the largest day bin (`trend-o-meter:421-422`). */
  def retentionSeconds: Long = dayBins.max.toLong * 86400L
}

object TrendParams {
  val default: TrendParams = TrendParams()
}
