package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.TrendParams
import graft.operators.{Sample, TextOps, TrendOps}

/** One parsed stream sample in long form (metric exploded out of the map). */
final case class StreamSample(ts: Timestamp, source: String, metric: String, value: Double)

/** Active-channel tracking output (A7). */
final case class ChannelUpdate(source: String, active: Boolean, last_seen_sec: Long)

/** One streaming CUSUM observation (see [[StreamOps.cusumStream]]). */
final case class CusumPoint(metric: String, e: Long, value: Double,
                            cusum: Double, breach: Boolean)

/** Gap-triggered micro-batch mean output (A4 exact parity). */
final case class TriggeredMean(metric: String, e: Long, mean_val: Double, n: Long)

/** One streaming derivative observation ([[StreamOps.derivativeStream]]). */
final case class SlopePoint(metric: String, e: Long, value: Double, slope: Double)

/** A user's funnel progress emission ([[StreamOps.funnelStream]]): the
  * deepest step reached so far. Levels only grow, so the latest (= max)
  * emission per user is the user's standing. */
final case class FunnelLevel(user_id: Long, level: Int)

/** Keyed funnel state: the anchor array of the DP plus the user's newest
  * event time (the TTL eviction clock). */
final case class FunnelState(anchors: Array[Long], max_ts_ms: Long)

/** One banded document row inside [[StreamOps.nearDupCandidatesStream]]. */
final case class BandedDoc(ts: Timestamp, doc_id: Long, sig: Array[Long],
                           band_idx: Int, band_sig: Int)

/** One document retained in a streaming LSH bucket's state. */
final case class BucketDoc(doc_id: Long, sig: Array[Long])

/** Per-bucket streaming LSH state: retained docs + newest activity. */
final case class BucketState(docs: List[BucketDoc], max_ts_ms: Long)

/** A streaming near-dup candidate pair (doc_a < doc_b). `est_jaccard` is
  * the MinHash signature-agreement estimate — the downstream exact verify
  * ([[graft.operators.DedupOps.jaccardForPairs]]) is batch-composable. */
final case class NearDupCandidate(doc_a: Long, doc_b: Long,
                                  est_jaccard: Double, band_idx: Int)

/** One pigeonhole-blocked document row inside
  * [[StreamOps.simHashPairsStream]]. */
final case class SimHashBlockedDoc(ts: Timestamp, doc_id: Long, sig: Long,
                                   chunk_idx: Int, chunk_sig: Long)

/** One document retained in a streaming SimHash block's state. */
final case class SimHashBucketDoc(doc_id: Long, sig: Long)

/** Per-block streaming SimHash state: retained docs + newest activity. */
final case class SimHashBucketState(docs: List[SimHashBucketDoc], max_ts_ms: Long)

/** A streaming VERIFIED SimHash near-dup pair (doc_a < doc_b): `hamming`
  * is the exact signature distance, already <= the gate's threshold. */
final case class SimHashMatch(doc_a: Long, doc_b: Long, hamming: Int,
                              chunk_idx: Int)

/** One hyperplane-bucketed vector row inside
  * [[StreamOps.embeddingNearDupStream]] — the vector itself is dropped
  * before the stateful exchange (bucketing is map-side; the gate only
  * needs ids). */
final case class EmbBucketedVec(ts: Timestamp, vec_id: Long, tbl: Int, bkt: Long)

/** Per-bucket streaming embedding-LSH state: retained vec_ids + newest
  * activity. Ids only — the gate emits candidates without computing a
  * distance (verify is batch-composable downstream), so state is
  * O(ids per TTL window), not O(ids × dim). */
final case class EmbBucketState(ids: List[Long], max_ts_ms: Long)

/** A streaming embedding near-dup CANDIDATE pair (vec_a < vec_b) from one
  * LSH table — the exact-cosine verify
  * ([[graft.operators.SimilarityOps.cosineVerifyPairs]]) is
  * batch-composable downstream, mirroring the batch
  * candidates-then-verify split. */
final case class EmbCandidate(vec_a: Long, vec_b: Long, tbl: Int)

/** Streaming layer — the reference's pub/sub pipeline re-expressed as
  * Structured Streaming (SURVEY §3.2: trigger = gap test, batch =
  * collectedSamples, state = metricHistory, output = display delta — exactly
  * the micro-batch model).
  *
  * Reference mapping:
  *  - S3 pub/sub source + F3 malformed drop → [[parseMessages]]
  *  - F5 metric extraction (single-metric restriction lifted) → [[explodeMetrics]]
  *  - F2 primary-source filter → [[primarySourceOnly]]
  *  - A4 micro-batch mean + M4 late data → [[microBatchMean]] (`withWatermark`
  *    gives the real late/out-of-order story the reference lacks)
  *  - A6 sliding rates → [[rateMetrics]]
  *  - A7 sessions → [[sessionWindows]] (built-in `session_window`) and
  *    [[activeChannels]] (keyed state + event-time timeout, the faithful
  *    "active set with inactivity eviction")
  *  - F1 faithful stream decimation → [[decimateStream]] (keyed `timeMark`
  *    state, trend-o-meter:296-310,387)
  *  - M1/M2/M3 append + re-aggregate + cull → incremental agg state in all of
  *    the above; watermark TTL is the retention cull.
  */
object StreamOps {

  /** S3 message schema (trend-o-meter:385,387,400-414):
    * `{ts: unixSeconds(fractional ok), source, value: {metric: num}}`. */
  val messageSchema: StructType = StructType(Seq(
    StructField("ts", DoubleType),
    StructField("source", StringType),
    StructField("value", MapType(StringType, DoubleType))))

  /** S3+F3: parse a raw JSON message stream (one STRING column `value`);
    * malformed or ts-less messages are dropped, not failed
    * (trend-o-meter:440-443). */
  def parseMessages(raw: DataFrame): DataFrame =
    raw
      .select(col("value"),
        from_json(col("value").cast("string"), messageSchema).as("m"))
      .where(col("m").isNotNull && col("m.ts").isNotNull)
      .select(
        col("m.ts").cast("timestamp").as("ts"),
        col("m.source").as("source"),
        col("m.value").as("metrics"),
        // bytes-on-the-wire of the raw message, carried so rate metrics
        // can honor the A6 byte-counter contract after parsing discards
        // the raw line
        octet_length(col("value").cast("string")).as("msg_bytes"))

  /** F5: metric map → long form; lifts the reference's single-metric
    * restriction (`throw 'nope not anymore!'`, trend-o-meter:121-123). */
  def explodeMetrics(parsed: DataFrame): DataFrame =
    parsed.select(col("ts"), col("source"),
      explode(col("metrics")).as(Seq("metric", "value")))

  /** F2: keep only the configured primary sensor (trend-o-meter:408). */
  def primarySourceOnly(samples: DataFrame, primary: String): DataFrame =
    samples.filter(col("source") === primary)

  /** A4+M4: tumbling-window per-metric mean with watermark — the streaming
    * shape of the reference's "average everything buffered since the last
    * processed point" (trend-o-meter:391,400-406). */
  def microBatchMean(samples: DataFrame,
                     width: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    samples
      .withWatermark("ts", watermark)
      .groupBy(col("metric"), window(col("ts"), width))
      // decimal-exact sum, one division — same merge-order-independent
      // mean contract as the batch counterpart (plain double avg() merges
      // partial sums in partition order and is not bit-deterministic)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .select(col("metric"), col("window.start").as("w_start"), col("n"),
        (col("sum_val") / col("n")).as("mean_val"))

  /** Streaming OHLC bars: the incremental form of
    * [[graft.operators.TrendOps.ohlcBars]] — same deterministic open/close
    * picks (lexicographic min/max over (event-time, value)), maintained per
    * (metric, tumbling window) as late data arrives, finalized by the
    * watermark. min/max/count are all mergeable aggregates, so state per
    * open bar is O(1) regardless of how many samples land in it. */
  def ohlcStream(samples: DataFrame,
                 width: String = "1 day",
                 watermark: String = "1 day"): DataFrame =
    samples
      .withWatermark("ts", watermark)
      .groupBy(col("metric"), window(col("ts"), width))
      .agg(
        count(lit(1)).as("n"),
        min(struct(col("ts"), col("value"))).getField("value").as("open"),
        max("value").as("high"),
        min("value").as("low"),
        max(struct(col("ts"), col("value"))).getField("value").as("close"))
      .select(col("metric"), col("window.start").as("bar_start"),
        col("n"), col("open"), col("high"), col("low"), col("close"))

  /** A6: sliding-window message/byte rates (trend-o-meter:459-519). The
    * reference's gap-repair bucket eviction is superseded by the watermark
    * (SURVEY §2.3 A6). */
  def rateMetrics(parsed: DataFrame,
                  windowSeconds: Int = 60,
                  watermark: String = "2 minutes"): DataFrame =
    parsed
      // wire bytes from parseMessages when available; the re-serialized
      // map is only the fallback for callers handing in bare (ts, source,
      // metrics) frames
      .withColumn("bytes",
        if (parsed.columns.contains("msg_bytes")) col("msg_bytes")
        else octet_length(to_json(col("metrics"))))
      .withWatermark("ts", watermark)
      .groupBy(col("source"), window(col("ts"), s"$windowSeconds seconds", "1 second"))
      .agg(count(lit(1)).as("msgs"), sum("bytes").as("bytes"))
      .select(
        col("source"), col("window.start").as("w_start"),
        col("msgs"), col("bytes"),
        (col("msgs") / lit(windowSeconds.toDouble)).as("msgs_per_sec"),
        (col("bytes") / lit(windowSeconds.toDouble)).as("bytes_per_sec"))

  /** A7 (declarative): per-channel sessions via the built-in
    * `session_window` — gap-based merge handled by the engine. */
  def sessionWindows(samples: DataFrame,
                     gap: String = "30 minutes",
                     watermark: String = "30 minutes"): DataFrame =
    samples
      .withWatermark("ts", watermark)
      .groupBy(col("source"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("source"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** A7 (faithful): active-channel set with inactivity eviction
    * (trend-o-meter:521-525,470-478) as keyed state + event-time timeout.
    * Emits `active=true` on activity, `active=false` when the channel times
    * out past the watermark. */
  def activeChannels(samples: Dataset[StreamSample], gapSeconds: Long): Dataset[ChannelUpdate] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, ChannelUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (source: String, events: Iterator[StreamSample], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(ChannelUpdate(source, active = false, last / 1000L))
          } else {
            val maxMs = (events.map(_.ts.getTime) ++ state.getOption.iterator).max
            state.update(maxMs)
            state.setTimeoutTimestamp(maxMs + gapSeconds * 1000L)
            Iterator(ChannelUpdate(source, active = true, maxMs / 1000L))
          }
      }
  }

  /** F1 (faithful, streaming): anchored-gap decimation as keyed `timeMark`
    * state per metric — the exact reference gate
    * `abs(ts − timeMark) > gap` with the mark advancing only on kept samples
    * (trend-o-meter:296-310,387). Within a micro-batch, events are processed
    * in event-time order (newest-first parity is a batch concept; the stream
    * applies arrival order like the reference's live path). */
  def decimateStream(samples: Dataset[StreamSample], gapSeconds: Double): Dataset[Sample] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .groupByKey(_.metric)
      // explicit seeded flag, not a -1 sentinel: a legitimate pre-epoch
      // sample at second -1 would round-trip AS the sentinel and reset the
      // gap gate (the batch operator keeps the same (mark, seeded) pair)
      .flatMapGroupsWithState[(Double, Boolean), Sample](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (metric: String, events: Iterator[StreamSample], state: GroupState[(Double, Boolean)]) =>
          var (mark, seeded) = state.getOption.getOrElse((0d, false))
          val kept = events.toSeq.sortBy(_.ts.getTime).flatMap { ev =>
            val sec = ev.ts.getTime / 1000L
            if (!seeded || math.abs(sec - mark) > gapSeconds) {
              mark = sec.toDouble
              seeded = true
              Some(Sample(metric, sec, ev.value, event_id = sec))
            } else None
          }
          state.update((mark, seeded))
          kept.iterator
      }
  }

  /** A4+F4 exact parity: the reference's gap-triggered micro-batch mean —
    * buffer every sample; when one passes the F1 gap test
    * (`abs(ts − timeMark) > gap`), emit the mean of everything buffered
    * since the last trigger (including the triggering sample, which
    * "carries" the mean — trend-o-meter:391,398-406), then reset the
    * buffer. Keyed running (mark, sum, count) state per metric. */
  def gapTriggeredMean(samples: Dataset[StreamSample], gapSeconds: Double): Dataset[TriggeredMean] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .groupByKey(_.metric)
      // same explicit seeded flag as [[decimateStream]] (no -1 sentinel)
      .flatMapGroupsWithState[(Double, Boolean, Double, Long), TriggeredMean](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (metric: String, events: Iterator[StreamSample],
         state: GroupState[(Double, Boolean, Double, Long)]) =>
          var (mark, seeded, sum, n) = state.getOption.getOrElse((0d, false, 0d, 0L))
          val out = events.toSeq.sortBy(_.ts.getTime).flatMap { ev =>
            val sec = ev.ts.getTime / 1000L
            sum += ev.value; n += 1
            if (!seeded || math.abs(sec - mark) > gapSeconds) {
              val m = TriggeredMean(metric, sec, sum / n, n)
              mark = sec.toDouble; seeded = true; sum = 0d; n = 0L
              Some(m)
            } else None
          }
          state.update((mark, seeded, sum, n))
          out.iterator
      }
  }

  /** Streaming EWMA: the [[graft.operators.TrendOps.ewma]] recurrence as
    * keyed (prev, seeded) state per metric — the stream continues exactly
    * where the batch recurrence left off (within a micro-batch, events are
    * folded in event-time order). Same-second ties fold in arrival order
    * ([[StreamSample]] carries no event_id to break them the way the batch
    * op does), so EXACT batch parity holds for streams with unique
    * per-metric timestamps — e.g. anything downstream of
    * [[decimateStream]]. The same tie caveat applies to [[cusumStream]]
    * and [[gapTriggeredMean]]. */
  def ewmaStream(samples: Dataset[StreamSample], alpha: Double): Dataset[graft.operators.EwmaPoint] = {
    val spark = samples.sparkSession
    import spark.implicits._
    samples
      .groupByKey(_.metric)
      .flatMapGroupsWithState[(Double, Boolean), graft.operators.EwmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (metric: String, events: Iterator[StreamSample], state: GroupState[(Double, Boolean)]) =>
          var (prev, seeded) = state.getOption.getOrElse((0d, false))
          val out = events.toSeq.sortBy(_.ts.getTime).map { ev =>
            val v = if (seeded) alpha * ev.value + (1 - alpha) * prev else ev.value
            prev = v
            seeded = true
            graft.operators.EwmaPoint(metric, ev.ts.getTime / 1000L, ev.value, v)
          }
          state.update((prev, seeded))
          out.iterator
      }
  }

  /** Streaming discrete derivative — the incremental twin of
    * [[graft.operators.TrendOps.derivative]]: one (prev value, prev e)
    * pair per metric is the entire state. The value delta computes in the
    * same HALF_UP 2-decimal arithmetic as the batch op's decimal cast and
    * divides once by the integer time gap, so emitted slopes are
    * bit-identical to batch on replay (asserted by the parity test).
    * Same-second successors emit nothing but still advance the
    * predecessor, exactly like the batch window's lag. Within a
    * micro-batch events process in event-time order; same-second ties
    * follow arrival order (the batch op's event_id tie-break has no
    * streaming counterpart — parity holds for distinct timestamps). */
  def derivativeStream(samples: Dataset[StreamSample]): Dataset[SlopePoint] = {
    val spark = samples.sparkSession
    import spark.implicits._
    def dec(v: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(v).setScale(2, java.math.RoundingMode.HALF_UP)
    samples
      .groupByKey(_.metric)
      .flatMapGroupsWithState[(Double, Long, Boolean), SlopePoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (metric: String, events: Iterator[StreamSample], state: GroupState[(Double, Long, Boolean)]) =>
          var (pv, pe, seeded) = state.getOption.getOrElse((0d, 0L, false))
          val out = List.newBuilder[SlopePoint]
          for (ev <- events.toSeq.sortBy(_.ts.getTime)) {
            val e = ev.ts.getTime / 1000L
            if (seeded && e != pe)
              out += SlopePoint(metric, e, ev.value,
                dec(ev.value).subtract(dec(pv)).doubleValue() / (e - pe).toDouble)
            pv = ev.value; pe = e; seeded = true
          }
          state.update((pv, pe, seeded))
          out.result().iterator
      }
  }

  /** Streaming CUSUM control chart (SPC): per metric, the running sum of
    * deviations from a fixed control `target`, with a breach flag at
    * |cusum| > threshold — the alerting form of the batch changepoint
    * screen (the batch op baselines on the series' own mean, which needs
    * the whole series; a control chart monitors against a SET target, so
    * one running double per metric is the entire state).
    *
    * Ordering contract: samples accumulate in event-time order WITHIN a
    * micro-batch, in arrival order ACROSS batches — a late cross-batch
    * sample appends its deviation at arrival position (no event-time
    * buffering; SPC charts track the monitored stream as observed).
    * Replays reproduce the same path because batch boundaries replay
    * identically from the checkpoint.
    *
    * Determinism contract: values, target and threshold all quantize to
    * 2-decimal fixed point (the repo-wide decimal(18,2) contract) and the
    * running sum accumulates in EXACT integer cents — order-independent
    * bits, so the emitted `cusum` double (one exact-integer / 100.0
    * division per point) and the breach flag (an integer compare) face a
    * plain SQL windowed decimal SUM bit-for-bit
    * (`stream_cusum_parity`). */
  def cusumStream(samples: Dataset[StreamSample], target: Double,
                  threshold: Double): Dataset[CusumPoint] = {
    val spark = samples.sparkSession
    import spark.implicits._
    def cents(v: Double): Long =
      java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()
    val targetCents = cents(target)
    val thresholdCents = cents(threshold)
    samples
      .groupByKey(_.metric)
      .flatMapGroupsWithState[Long, CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (metric: String, events: Iterator[StreamSample], state: GroupState[Long]) =>
          var acc = state.getOption.getOrElse(0L)
          val out = events.toSeq.sortBy(_.ts.getTime).map { ev =>
            acc += cents(ev.value) - targetCents
            CusumPoint(metric, ev.ts.getTime / 1000L, ev.value, acc / 100.0,
              math.abs(acc) > thresholdCents)
          }
          state.update(acc)
          out.iterator
      }
  }

  /** Stream-stream interval join: each left event joined to the same
    * channel's right events in the trailing `windowSeconds` — the streaming
    * shape of the batch range join (purchases ← trailing clicks). BOTH
    * sides carry a watermark and the join condition bounds event time in
    * both directions, so the engine can evict join state — the unbounded
    * stream-join state trap avoided by construction. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   windowSeconds: Long = 300,
                   watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
    val r = right
      .select(col("ts").as("r_ts"), col("source").as("r_source"),
        col("metric").as("r_metric"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col("source") === col("r_source") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
        col("r_ts") <= col("ts"))
  }

  /** Stream-static enrichment: join each streaming sample to a (small)
    * static dimension table — channel metadata, display config, unit
    * conversions. The static side is explicitly `broadcast()`: every
    * micro-batch maps over the stream with a hash lookup, no state store
    * and no stream-side shuffle, which is the only posture that holds when
    * the stream side is unbounded. Left join so samples with no dimension
    * row survive (enrichment must never drop data). */
  def enrichStream(samples: DataFrame, dim: DataFrame, key: String): DataFrame =
    samples.join(broadcast(dim), Seq(key), "left")

  /** Message hygiene for at-least-once transports: drop re-deliveries of
    * the same (source, metric, ts) sample. `dropDuplicatesWithinWatermark`
    * keeps dedup state only within the watermark horizon — bounded state,
    * unlike a plain streaming `dropDuplicates` whose key set grows forever.
    * On a BATCH frame (the replay harness's empty-fixture fallback hands
    * one) the within-watermark variant is unsupported and unnecessary —
    * bounded data dedups with the plain form, same semantics. */
  def dedupStream(samples: DataFrame, watermark: String = "10 minutes"): DataFrame =
    if (!samples.isStreaming)
      samples.dropDuplicates("source", "metric", "ts")
    else samples
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("source", "metric", "ts")

  /** Corpus-append dedup AT INGEST — the streaming twin of
    * [[graft.operators.DedupOps.incrementalDedup]]: each arriving doc's
    * normalized-text key is (1) screened against the standing corpus and
    * (2) deduped against the stream's own history via watermark-bounded
    * state (first arrival wins — with event time ascending in doc_id,
    * that is the min-id winner, matching batch).
    *
    * The corpus screen is a BLOOM PRE-GATE plus exact reconciliation
    * (round-10 verdict item 2 — the previous posture broadcast the full
    * distinct key set, which at a 1B-doc corpus is ~16 GB of keys and
    * driver-fatal). [[graft.operators.RelationalOps.buildKeyBloom]] folds
    * the corpus keys into one clamped-size filter ONCE at query build
    * (≤8 MB rides to tasks; no per-key driver materialization — the
    * aggregate merges partials map-side). Per micro-batch:
    *
    *  - rows the bloom REJECTS are definitely-new (no false negatives) and
    *    skip the join entirely — at a healthy dup rate that is ~99% of the
    *    stream, so the exact join's stream side is the suspect sliver;
    *  - rows the bloom suspects face an exact un-hinted left-anti join
    *    against the corpus key relation — the planner shuffles (SMJ) when
    *    the key set is big instead of being forced through a broadcast.
    *    The per-batch corpus-side scan is the inherent stream-static cost;
    *    at warehouse scale store the key relation bucketed by key so that
    *    leg is a co-located probe, and rebuild the bloom on corpus epochs.
    *
    * False positives only cost their pass through the exact join (which
    * re-verifies every key), so output equals the plain anti-join
    * bit-for-bit. NULL keys (null text) are routed as definitely-new —
    * anti-join semantics keep them, and the null-key coalesce here keeps
    * the bloom's tri-state NULL from silently dropping the row. In-stream
    * state is one key per unseen doc within the watermark horizon. */
  def incrementalDedupStream(docs: DataFrame, corpus: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val corpusKeys =
      corpus.select(md5(TextOps.normalized(col("text"))).as("__key")).distinct()
    val bloom = graft.operators.RelationalOps.buildKeyBloomAuto(
      corpusKeys, col("__key"))
    val keyed = docs.withColumn("__key", md5(TextOps.normalized(col("text"))))
    val suspect = coalesce(
      graft.operators.RelationalOps.mightContainKey(bloom, col("__key")),
      lit(false))
    val screened = keyed.where(!suspect).unionByName(
      keyed.where(suspect).join(corpusKeys, Seq("__key"), "left_anti"))
    val deduped =
      if (!docs.isStreaming) screened.dropDuplicates("__key")
      else screened.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("__key")
    deduped.drop("__key")
  }

  /** A7 via `transformWithState` (the arbitrary-state API that supersedes
    * `flatMapGroupsWithState`): typed per-channel `lastSeen` state + an
    * event-time timer per channel; the timer fires when the watermark
    * passes `lastSeen + gap`, emitting the eviction. Requires the RocksDB
    * state store provider (`spark.sql.streaming.stateStore.providerClass`).
    * Same output contract as [[activeChannels]]. */
  def activeChannelsTWS(samples: Dataset[StreamSample], gapSeconds: Long): Dataset[ChannelUpdate] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.TimeMode
    samples
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.source)(Encoders.STRING)
      .transformWithState(
        new ActiveChannelProcessor(gapSeconds),
        TimeMode.EventTime(),
        OutputMode.Update())(Encoders.product[ChannelUpdate])
  }

  /** Streaming 1-minute rollup-tier maintenance: the incremental producer
    * of the tier that [[graft.operators.TrendOps]]-style batch queries
    * compose upward (the a24 contract: count/sum/min/max merge
    * associatively, so a 1h view is a re-aggregation of this output).
    * Update mode + a keyed upsert sink ([[Sinks.lastValueSink]] keyed by
    * (metric, minute)) maintain the tier table; the decimal sum keeps the
    * tier bit-exact with a batch recomputation over the same samples. */
  def minuteTierStream(samples: DataFrame,
                       watermark: String = "2 minutes"): DataFrame =
    samples
      .withWatermark("ts", watermark)
      .groupBy(col("metric"), window(col("ts"), "1 minute"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sv"),
        min("value").as("mn"),
        max("value").as("mx"))
      .select(col("metric"), col("window.start").as("minute_start"),
        col("n"), col("sv"), col("mn"), col("mx"))

  /** Streaming heavy-hitters maintenance — the incremental producer of
    * per-lang Misra–Gries term summaries (the a34 sketch tier's streaming
    * twin): a running "top terms since start" over a document stream, the
    * dashboard shape the batch a34 computes at rest.
    *
    * State shape at scale: ONE O(cap) summary per lang key — the streaming
    * aggregation state IS the MG buffer, merged incrementally per
    * micro-batch with the PODS'12 combine ([[graft.operators.HeavyHitters]]).
    * Below cap the merge is plain pointwise addition, so cross-batch counts
    * are EXACT and batch-order-independent — which is what lets the replay
    * parity row face the exact-count oracle; eviction bounds above cap are
    * pinned by HeavyHittersSpec.
    *
    * Update mode: each batch re-emits the summaries of langs it touched;
    * a keyed upsert (last emission per lang) maintains the summary table.
    *
    * @param docs streaming frame with (lang string, text string) columns
    */
  def topTermsStream(docs: DataFrame, cap: Int = 256): DataFrame =
    docs
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("lang")
      .agg(graft.operators.HeavyHitters.summary(col("term"), cap).as("sk"))

  /** Streaming quantile-tier maintenance — the incremental producer of
    * per-(metric, minute) GK summaries ([[graft.operators.QuantileSketch]]),
    * the a35 tier's streaming twin: the aggregation state is the mergeable
    * sketch itself, so a batch re-aggregation composes the streamed minute
    * tier into hours and queries percentiles exactly as it would over an
    * at-rest tier (the same contract [[minuteTierStream]] has with a24).
    * In the eps < 1/(2N) exactness regime the composed result is
    * bit-identical to the batch tier — the replay parity row shares a35's
    * oracle verbatim. */
  def quantileTierStream(samples: DataFrame, eps: Double,
                         watermark: String = "2 minutes"): DataFrame =
    samples
      .withWatermark("ts", watermark)
      .groupBy(col("metric"), window(col("ts"), "1 minute"))
      .agg(graft.operators.QuantileSketch.summary(col("value"), eps).as("sk"))
      .select(col("metric"), col("window.start").as("minute_start"), col("sk"))

  /** Streaming HLL-tier maintenance — the incremental producer of
    * per-(metric, minute) distinct-user sketches (a26's streaming twin,
    * closing the tier-twin family: a24 counts, a34 frequencies, a35
    * quantiles, a26 distincts): the aggregation state is the HLL sketch,
    * union-merged per micro-batch. Register-wise max is associative and
    * order-independent, so a batch composition of the streamed minute tier
    * is EXACTLY the batch tier's estimate (pinned by the parity test). */
  def hllTierStream(samples: DataFrame, watermark: String = "2 minutes"): DataFrame =
    samples
      .withWatermark("ts", watermark)
      .groupBy(col("metric"), window(col("ts"), "1 minute"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .select(col("metric"), col("window.start").as("minute_start"), col("sk"))

  /** Streaming windowed funnel — the incremental twin of
    * [[graft.operators.TrendOps.windowFunnel]]: the anchor-propagation DP
    * runs per user with the O(K) anchor array as the ENTIRE keyed state
    * (the DP was built for exactly this — a bigger step-1 anchor
    * dominates, so no event history is retained), emitting a
    * [[FunnelLevel]] row whenever a user's reached depth grows. Within a
    * micro-batch events fold in (event-time, step) order — the batch
    * op's tie rule — and the replay slicer cuts on whole seconds, so
    * same-second ties never straddle a state boundary; levels are
    * monotone, so the parity surface is max(level) per user, which must
    * equal the batch DP's per-user level exactly (shared oracle).
    *
    * @param events streaming frame with (ts timestamp, user_id long, metric string)
    */
  def funnelStream(events: DataFrame, steps: Seq[String],
                   windowSeconds: Long,
                   ttl: String = "30 days",
                   watermark: String = "10 minutes"): Dataset[FunnelLevel] = {
    require(steps.size >= 2, "a funnel needs at least 2 steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    // The TTL eviction argument below ("an evicted chain could not have
    // completed anyway") only holds when the TTL covers the funnel
    // window — enforce it rather than silently diverging from batch.
    val ttlIv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(ttl))
    val ttlMs = ttlIv.months * 2592000000L + ttlIv.days * 86400000L +
      ttlIv.microseconds / 1000L
    require(ttlMs >= windowSeconds * 1000L,
      s"ttl '$ttl' must cover windowSeconds=$windowSeconds — an anchor " +
        "evicted inside the funnel window would lose completions batch finds")
    val k = steps.size
    val idxOf = steps.zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap
    val spark = events.sparkSession
    import spark.implicits._
    // Late-arrival contract: events older than the watermark are dropped
    // BEFORE the DP (standard event-time stateful semantics) — size the
    // watermark to the source's real disorder; the replay harness passes
    // "0 seconds" because its slices arrive in time order.
    // State is one O(K) entry per user — but on an unbounded stream every
    // user that EVER sent a step event would retain it forever without an
    // eviction horizon. Same TTL posture as the near-dup gates: a user
    // idle past `ttl` of their own newest event is evicted (their chain
    // could not complete inside the window anyway once ttl >= the funnel
    // window); the replay harness passes a retain-everything ttl, where
    // parity with the batch DP is defined.
    events
      .select(col("ts"), col("user_id"), col("metric"))
      .withWatermark("ts", watermark)
      .as[(Timestamp, Long, String)]
      .filter(t => idxOf.contains(t._3))
      .groupByKey(_._2)
      .flatMapGroupsWithState[FunnelState, FunnelLevel](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[(Timestamp, Long, String)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption
              .getOrElse(FunnelState(Array.fill(k)(-1L), 0L))
            val anchors = st.anchors
            val levelBefore = anchors.count(_ >= 0L)
            var maxMs = st.max_ts_ms
            val sorted = evs.toSeq
              .map { t => maxMs = math.max(maxMs, t._1.getTime)
                (t._1.getTime / 1000L, idxOf(t._3)) }
              .sorted
            for ((e, j) <- sorted) {
              if (j == 1) anchors(0) = math.max(anchors(0), e)
              else if (anchors(j - 2) >= 0L && e - anchors(j - 2) <= windowSeconds)
                anchors(j - 1) = math.max(anchors(j - 1), anchors(j - 2))
            }
            state.update(FunnelState(anchors, maxMs))
            state.setTimeoutTimestamp(maxMs, ttl)
            val level = anchors.count(_ >= 0L)
            if (level > levelBefore) Iterator(FunnelLevel(user, level))
            else Iterator.empty
          }
      }
  }

  /** Streaming gap alerts per metric ([[GapAlertProcessor]]): the streaming
    * counterpart of the batch gap report — the open alert exists ONLY here,
    * because it fires when data does not arrive. Same RocksDB/TWS
    * requirements as [[activeChannelsTWS]]. */
  def gapAlertStream(samples: Dataset[StreamSample], gapSeconds: Long): Dataset[GapAlert] = {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.TimeMode
    samples
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.metric)(Encoders.STRING)
      .transformWithState(
        new GapAlertProcessor(gapSeconds),
        TimeMode.EventTime(),
        OutputMode.Update())(Encoders.product[GapAlert])
  }

  /** Streaming MinHash-LSH near-dup candidate gate — dedup-at-ingest, the
    * streaming counterpart of [[graft.operators.DedupOps.minHashCandidates]]
    * (same signature expression, same banding arithmetic, so the candidate
    * sets agree with batch — asserted by the parity test).
    *
    * Shape at scale: the signature + banding stage is the SAME map-only
    * codegen loop as batch (no explode of shingles, no shuffle); the one
    * stateful exchange keys on (band_idx, band_sig) — the LSH bucket — so
    * state is sharded by bucket across executors exactly like the batch
    * bucket equi-join's shuffle. Each bucket retains the (doc_id,
    * signature) of documents seen within `ttl` of the bucket's newest
    * activity (event-time timeout past the watermark): streaming dedup
    * state is inherently WINDOWED — an unbounded exact memory of a 100 TB
    * corpus belongs in the batch path, and the TTL is the knob that makes
    * the state O(docs-per-TTL-window), not O(corpus). `maxPerBucket`
    * additionally bounds any SINGLE bucket (the boilerplate-skew case):
    * past the cap a bucket stops retaining but keeps flagging new
    * arrivals against its retained representatives.
    *
    * Emits one candidate per (pair, bucket) in APPEND mode when the later
    * document arrives; a pair sharing several bands emits from each (the
    * operator is the pair-generation primitive — downstream either
    * `dropDuplicatesWithinWatermark` or the exact-Jaccard verify dedups,
    * mirroring batch `minHashCandidates.distinct()`). Within a micro-batch
    * a bucket processes documents in (ts, doc_id) order, so output is
    * deterministic under replay.
    *
    * @param docs streaming frame with (ts timestamp, doc_id long, text string)
    */
  def nearDupCandidatesStream(docs: DataFrame, k: Int = 64, bands: Int = 16,
                              ttl: String = "1 hour",
                              watermark: String = "10 minutes",
                              maxPerBucket: Int = 10000): Dataset[NearDupCandidate] = {
    require(k % bands == 0, "k must be divisible by bands")
    val r = k / bands
    val spark = docs.sparkSession
    import spark.implicits._
    // Same per-band slice hash as DedupOps.minHashCandidates — candidate
    // parity with the batch operator depends on this line matching.
    val bandCols = array((0 until bands).map(b =>
      hash(lit(1), slice(col("sig"), b * r + 1, r))): _*)
    val banded = docs
      .withWatermark("ts", watermark)
      .select(col("ts"), col("doc_id"),
        graft.functions.HashExpressions.minHashSig(
          TextOps.shingles(col("text")), k).as("sig"))
      .select(col("ts"), col("doc_id"), col("sig"), posexplode(bandCols))
      .toDF("ts", "doc_id", "sig", "band_idx", "band_sig")
      .as[BandedDoc]
    banded
      .groupByKey(b => (b.band_idx, b.band_sig))
      .flatMapGroupsWithState[BucketState, NearDupCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((bandIdx, _), events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(BucketState(Nil, 0L))
            val out = List.newBuilder[NearDupCandidate]
            for (ev <- events.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))) {
              if (!st.docs.exists(_.doc_id == ev.doc_id)) {
                for (prior <- st.docs) {
                  var eq = 0; var i = 0
                  while (i < k) {
                    if (prior.sig(i) == ev.sig(i)) eq += 1; i += 1
                  }
                  out += NearDupCandidate(
                    math.min(prior.doc_id, ev.doc_id),
                    math.max(prior.doc_id, ev.doc_id),
                    eq.toDouble / k, bandIdx)
                }
                // Skew guard: a pathological bucket (boilerplate-identical
                // docs) stops RETAINING past the cap — arrivals still
                // compare against (and get flagged by) the retained
                // representatives, but state and per-arrival work stay
                // O(maxPerBucket), the streaming analogue of the batch
                // path's AQE skew-split.
                if (st.docs.lengthCompare(maxPerBucket) < 0)
                  st = BucketState(BucketDoc(ev.doc_id, ev.sig) :: st.docs,
                    math.max(st.max_ts_ms, ev.ts.getTime))
                else st = st.copy(max_ts_ms = math.max(st.max_ts_ms, ev.ts.getTime))
              } else st = st.copy(max_ts_ms = math.max(st.max_ts_ms, ev.ts.getTime))
            }
            state.update(st)
            state.setTimeoutTimestamp(st.max_ts_ms, ttl)
            out.result().iterator
          }
      }
  }

  /** Streaming SimHash near-dup gate — the streaming counterpart of
    * [[graft.operators.DedupOps.simHashPairs]], and unlike the MinHash gate
    * it emits fully VERIFIED pairs: the Hamming verify is one XOR+popcount
    * against the signatures already held in state, so blocking and verify
    * fuse into the stateful stage exactly as the batch operator fuses its
    * candidate join with [[graft.operators.DedupOps.hammingPairs]].
    *
    * Same pigeonhole arithmetic as batch (64/(maxHamming+1)-bit chunks —
    * any pair within the Hamming bound must agree on at least one chunk),
    * so verified pair sets agree with batch on the same corpus (asserted
    * by the parity test). State is TTL-windowed per block, the same
    * O(docs-per-window) posture as [[nearDupCandidatesStream]]; state rows
    * are (doc_id, one long), 8× leaner than the MinHash gate's signatures.
    *
    * @param docs streaming frame with (ts timestamp, doc_id long, text string)
    */
  def simHashPairsStream(docs: DataFrame, maxHamming: Int = 3,
                         ttl: String = "1 hour",
                         watermark: String = "10 minutes",
                         maxPerBucket: Int = 10000): Dataset[SimHashMatch] = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val mask = (1L << width) - 1L
    val spark = docs.sparkSession
    import spark.implicits._
    // Same chunking expression as DedupOps.simHashCandidates — block
    // parity with the batch operator depends on this line matching.
    val chunkCols = array((0 until chunks).map(c =>
      shiftrightunsigned(col("sig"), c * width).bitwiseAND(lit(mask))): _*)
    val blocked = docs
      .withWatermark("ts", watermark)
      .select(col("ts"), col("doc_id"),
        graft.functions.HashExpressions.simHash64(
          TextOps.tokens(col("text"))).as("sig"))
      .select(col("ts"), col("doc_id"), col("sig"), posexplode(chunkCols))
      .toDF("ts", "doc_id", "sig", "chunk_idx", "chunk_sig")
      .as[SimHashBlockedDoc]
    blocked
      .groupByKey(b => (b.chunk_idx, b.chunk_sig))
      .flatMapGroupsWithState[SimHashBucketState, SimHashMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((chunkIdx, _), events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(SimHashBucketState(Nil, 0L))
            val out = List.newBuilder[SimHashMatch]
            for (ev <- events.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))) {
              if (!st.docs.exists(_.doc_id == ev.doc_id)) {
                for (prior <- st.docs) {
                  val h = java.lang.Long.bitCount(prior.sig ^ ev.sig)
                  if (h <= maxHamming)
                    out += SimHashMatch(
                      math.min(prior.doc_id, ev.doc_id),
                      math.max(prior.doc_id, ev.doc_id), h, chunkIdx)
                }
                // Same skew guard as nearDupCandidatesStream: stop
                // retaining past the cap, keep flagging against the
                // retained representatives.
                if (st.docs.lengthCompare(maxPerBucket) < 0)
                  st = SimHashBucketState(SimHashBucketDoc(ev.doc_id, ev.sig) :: st.docs,
                    math.max(st.max_ts_ms, ev.ts.getTime))
                else st = st.copy(max_ts_ms = math.max(st.max_ts_ms, ev.ts.getTime))
              } else st = st.copy(max_ts_ms = math.max(st.max_ts_ms, ev.ts.getTime))
            }
            state.update(st)
            state.setTimeoutTimestamp(st.max_ts_ms, ttl)
            out.result().iterator
          }
      }
  }

  /** Streaming embedding near-dup candidate gate — the embedding-cosine
    * member of the dedup-at-ingest family ([[nearDupCandidatesStream]],
    * [[simHashPairsStream]]): random-hyperplane LSH buckets (the SAME
    * deterministic planes as batch
    * [[graft.operators.SimilarityOps.embeddingCandidatePairs]], so
    * candidate sets agree when nothing evicts), one stateful exchange
    * keyed on (table, bucket), TTL-windowed per-bucket vector retention
    * with the same skew cap as the text gates. Emits one CANDIDATE per
    * (pair, table) in append mode when the later vector arrives; the
    * exact-cosine verify stays batch-composable downstream
    * ([[graft.operators.SimilarityOps.cosineVerifyPairs]]), mirroring the
    * batch candidates-then-verify split — the gate never computes a
    * distance, so state retains IDS only (O(ids) per bucket, not
    * O(ids × dim)), and a downstream `.distinct()` collapses multi-table
    * hits exactly like batch `.distinct()`.
    *
    * @param vectors streaming frame with
    *                (ts timestamp, vec_id long, embedding array&lt;float&gt;)
    */
  def embeddingNearDupStream(vectors: DataFrame,
                             dim: Int = 64, tables: Int = 8,
                             bitsPerTable: Int = 8, seed: Long = 42L,
                             ttl: String = "1 hour",
                             watermark: String = "10 minutes",
                             maxPerBucket: Int = 10000): Dataset[EmbCandidate] = {
    val planes = graft.operators.SimilarityOps.hyperplanes(dim, tables, bitsPerTable, seed)
    val spark = vectors.sparkSession
    import spark.implicits._
    // Same bucket expression as the batch candidate generator — parity
    // depends on this line matching.
    val bucketed = vectors
      .withWatermark("ts", watermark)
      .select(col("ts"), col("vec_id"),
        posexplode(graft.functions.HashExpressions.hyperplaneBuckets(
          col("embedding"), planes)))
      .toDF("ts", "vec_id", "tbl", "bkt")
      .withColumn("tbl", col("tbl").cast("int"))
      .as[EmbBucketedVec]
    bucketed
      .groupByKey(b => (b.tbl, b.bkt))
      .flatMapGroupsWithState[EmbBucketState, EmbCandidate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((tbl, _), events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var st = state.getOption.getOrElse(EmbBucketState(Nil, 0L))
            val out = List.newBuilder[EmbCandidate]
            for (ev <- events.toSeq.sortBy(e => (e.ts.getTime, e.vec_id))) {
              if (!st.ids.contains(ev.vec_id)) {
                for (prior <- st.ids)
                  out += EmbCandidate(
                    math.min(prior, ev.vec_id),
                    math.max(prior, ev.vec_id), tbl)
                // Same skew guard as the text gates: stop retaining past
                // the cap, keep flagging against the retained
                // representatives.
                if (st.ids.lengthCompare(maxPerBucket) < 0)
                  st = EmbBucketState(ev.vec_id :: st.ids,
                    math.max(st.max_ts_ms, ev.ts.getTime))
                else st = st.copy(max_ts_ms = math.max(st.max_ts_ms, ev.ts.getTime))
              } else st = st.copy(max_ts_ms = math.max(st.max_ts_ms, ev.ts.getTime))
            }
            state.update(st)
            state.setTimeoutTimestamp(st.max_ts_ms, ttl)
            out.result().iterator
          }
      }
  }

  /** M1+M2+M3+A2 (recompute model): the reference re-runs the full banded
    * extents over retained history after every accepted sample
    * (trend-o-meter:316-333,418). `foreachBatch` + an accumulating history
    * with retention cull reproduces that model exactly for parity tests;
    * production streaming uses the incremental aggregations above instead.
    * Each batch local-checkpoints a fresh history and the previous
    * checkpoint's blocks are reclaimed only on driver GC (ContextCleaner)
    * — bounded for the parity-test lifetimes this class exists for, one
    * more reason production uses the incremental operators. */
  final class RecomputeLoop(p: TrendParams = TrendParams.default) extends Serializable {
    @volatile private var history: Option[DataFrame] = None
    @volatile private var latest: Option[DataFrame] = None

    /** Feed one micro-batch of the canonical series relation. */
    def onBatch(batch: DataFrame): Unit = synchronized {
      val unioned = history.map(_.unionByName(batch)).getOrElse(batch)
      // M3: cull beyond the horizon, then checkpoint-cache the small history.
      val culled = TrendOps.retentionCull(unioned, p.retentionSeconds)
        .select(batch.columns.toIndexedSeq.map(col): _*)
      val materialized = culled.localCheckpoint(true)
      history = Some(materialized)
      latest = Some(TrendOps.bandedExtents(materialized, p))
    }

    def extents: Option[DataFrame] = latest
  }
}
