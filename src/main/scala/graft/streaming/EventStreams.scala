package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming re-expression of the reference's streaming query
  * delivery (reference: src/query_stream.rs, src/cypher/streaming.rs —
  * the reference pages result batches to a consumer with backpressure;
  * Spark's micro-batch engine IS that loop, so the operators here are the
  * interesting part: incremental filter/transform, watermarked windowed
  * aggregation, and stateful sessionization).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark;
  * sessionization state is per-user and dropped on timeout. Both shuffle
  * once on the grouping key — the same plan shape a 1000-executor job
  * would run.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(start: Timestamp, last: Timestamp, n: Long)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long)

  /** Normalize the events `ts` column to TIMESTAMP_NTZ regardless of how
    * the parquet stored it. Generators have shipped both layouts:
    * TIMESTAMP(NANOS) — which Spark's reader rejects natively, so it is
    * read as BIGINT nanos under the legacy conf and converted (lossless:
    * the generator emits µs precision; DIV keeps the arithmetic in exact
    * integers) — and plain TIMESTAMP(MICROS), which reads as a timestamp
    * type directly and only needs the NTZ cast. Dispatching on the
    * OBSERVED schema keeps every downstream operator and oracle stable
    * across testdata regenerations. */
  private def tsToNtz(schema: org.apache.spark.sql.types.StructType) =
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr(
        "CAST(timestamp_micros(CAST(ts DIV 1000 AS BIGINT)) AS TIMESTAMP_NTZ)")
      case _ => expr("CAST(ts AS TIMESTAMP_NTZ)")
    }

  def eventsTable(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.withColumn("ts", tsToNtz(df.schema))
  }

  /** File-source stream over the events parquet (one file = one batch in
    * tests via Trigger.AvailableNow; in production a growing directory). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // file source wants a directory: watch the dir, admit only events files
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", tsToNtz(schema))
  }

  /** Incremental filter/transform stage (reference query_stream.rs
    * batched delivery of a filtered query). */
  def highValue(events: DataFrame, minValue: Double): DataFrame =
    events.filter(col("value") >= minValue)
      .withColumn("value_bucket", floor(col("value") / 10.0).cast("long"))

  /** ONE windowed-aggregation pipeline behind the tumbling/sliding
    * stream ops and their batch twins — the watermark horizon, agg
    * contract and output shape must not drift between the four. */
  private def windowAgg(events: DataFrame, slide: Option[String],
                        streaming: Boolean): DataFrame = {
    val win = slide.fold(window(col("ts"), "1 hour"))(
      s => window(col("ts"), "1 hour", s))
    val in =
      if (streaming) events.withColumn("ts", col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
      else events
    val agg = in.groupBy(win, col("event_type"))
      .agg(count(lit(1)).cast("long").as("cnt"),
        round(sum(col("value")), 4).as("total"))
    if (streaming)
      agg.select(col("window.start").as("wstart"), col("event_type"),
        col("cnt"), col("total"))
    else
      agg.select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("cnt"), col("total"))
  }

  /** Watermarked hourly windowed aggregation per event type. Watermarks
    * need an LTZ timestamp — value-preserving here (sessions run UTC). */
  def windowedCounts(events: DataFrame): DataFrame =
    windowAgg(events, None, streaming = true)

  /** Sliding-window aggregation: 1-hour windows every 30 minutes, so
    * each event lands in exactly window/slide = 2 overlapping windows
    * (epoch-aligned, mirroring the oracle's 2-row expansion). Same
    * watermark/state story as [[windowedCounts]] — state is bounded by
    * (watermark horizon / slide) open windows per key. */
  def slidingCounts(events: DataFrame): DataFrame =
    windowAgg(events, Some("30 minutes"), streaming = true)

  /** Stateful sessionization: events within `gapMinutes` of each other
    * belong to one session; a session closes when the gap passes (or the
    * group times out). flatMapGroupsWithState keeps one small state row
    * per active user. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[SessionState]) =>
          // Micro-batch arrival order is not guaranteed: sort within batch.
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[Session]
          evs.foreach { e =>
            st match {
              case null =>
                st = SessionState(e.ts, e.ts, 1L)
              case s if e.ts.getTime - s.last.getTime <= gapMs =>
                st = s.copy(last = e.ts, n = s.n + 1)
              case s =>
                closed += Session(uid, s.start, s.last, s.n)
                st = SessionState(e.ts, e.ts, 1L)
            }
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }

  /** Streaming burst dedup — the exactly-once guard a training-data
    * pipeline puts in front of an at-least-once event feed: collapse
    * each (user, event_type, hour) burst to a single event.
    * dropDuplicatesWithinWatermark keeps the seen-key state bounded by
    * the watermark horizon, so state never grows with stream length. */
  def burstDedup(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .withColumn("bucket", date_trunc("hour", col("ts")))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "bucket")

  /** Streaming stream-stream interval join — the online form of
    * [[graft.ops.RangeJoin]]'s signup-attribution query: every click
    * joins the same user's signups whose window [sts, sts + 1 h]
    * contains the click time. Spark's stream-stream join buffers both
    * sides in the state store; the watermark plus the two-sided time
    * bound lets it EVICT — a signup older than watermark + 1 h can
    * never match a future click, so state stays bounded by the
    * watermark horizon regardless of stream length (the contract the
    * spec pins stream ≡ batch across micro-batches). Inner join →
    * append-mode output, no emit delay beyond the match itself. */
  def intervalJoinStream(clicks: DataFrame, signups: DataFrame): DataFrame = {
    val c = clicks
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
    val s = signups
      .withColumn("sts", col("sts").cast("timestamp"))
      .withWatermark("sts", "2 hours")
    c.join(s,
      col("user_id") === col("s_user_id") &&
        col("ts") >= col("sts") &&
        col("ts") <= col("sts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("user_id"), col("ts"), col("signup_id"))
  }

  /** Left-outer streaming interval join — attribution WITH the organic
    * traffic: clicks inside a signup window emit matched (append-mode,
    * no delay beyond the match), clicks with no signup emit once with
    * a NULL signup_id — but only after the watermark passes the point
    * where a matching signup could still arrive, which is exactly the
    * state-eviction moment. This is the outer-join contract Structured
    * Streaming adds on top of [[intervalJoinStream]]: the null row's
    * emission time is governed by the same horizon that bounds state,
    * so "unmatched" is never declared early and state never outlives
    * the watermark. */
  def intervalJoinOuterStream(clicks: DataFrame, signups: DataFrame): DataFrame = {
    val c = clicks
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "2 hours")
    val s = signups
      .withColumn("sts", col("sts").cast("timestamp"))
      .withWatermark("sts", "2 hours")
    c.join(s,
      col("user_id") === col("s_user_id") &&
        col("ts") >= col("sts") &&
        col("ts") <= col("sts") + expr("INTERVAL 1 HOUR"),
      "leftOuter")
      .select(col("click_id"), col("user_id"), col("ts"), col("signup_id"))
  }

  /** Per-user inter-arrival features: event count plus mean/max gap in
    * seconds between consecutive events — the temporal-regularity
    * signal behind bot/burst detection and session-gap tuning. One
    * user-keyed window (lag over event time, event_id tiebreak for
    * equal timestamps) + one aggregate; nothing shuffles more than the
    * event rows themselves. */
  def interArrival(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("gap",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n_events"),
        round(avg(col("gap")), 6).as("avg_gap_s"),
        max(col("gap")).cast("long").as("max_gap_s"))
      .orderBy("user_id")
  }

  /** Funnel conversion: of all `fromType` events, how many saw the
    * same user produce a `toType` event within `withinHours` —
    * the conversion metric every event pipeline reports. Composes the
    * bucketized [[graft.ops.RangeJoin]] (each start opens an interval,
    * hits are points), so the match is an equi-join on (user, time
    * bucket) — never a per-user cross product — and the two 1-row
    * aggregates broadcast into the final rate. */
  def funnel(events: DataFrame, fromType: String = "signup",
             toType: String = "purchase", withinHours: Int = 168): DataFrame = {
    // caller-facing guard: a zero/negative window would otherwise
    // surface as RangeJoin's internal `bucketSeconds > 0` requirement
    require(withinHours >= 1,
      s"funnel conversion window must be >= 1 hour, got $withinHours")
    val starts = events.filter(col("event_type") === fromType)
      .select(col("event_id").as("start_id"), col("user_id"),
        col("ts").as("sstart"),
        (col("ts") + expr(s"INTERVAL $withinHours HOURS")).as("send"))
    val hits = events.filter(col("event_type") === toType)
      .select(col("event_id").as("hit_id"), col("user_id"), col("ts"))
    // bucket width = the interval length, per RangeJoin's own contract:
    // each start explodes into exactly 2 bucket replicas; the default
    // 1 h bucket against a 168 h window would make that ~169 replicas
    // per start for zero extra precision (the residual BETWEEN filter
    // does the exact match either way)
    val converted = graft.ops.RangeJoin
      .pointInInterval(hits, starts, Seq("user_id"), "ts", "sstart", "send",
        bucketSeconds = withinHours * 3600L)
      .select("start_id").distinct()
    starts.agg(count(lit(1)).cast("long").as("n_starts"))
      .crossJoin(broadcast(converted.agg(
        count(lit(1)).cast("long").as("n_converted"))))
      .select(col("n_starts"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_starts"), 6).as("rate"))
  }

  /** Time-to-convert distribution for the fromType → toType funnel:
    * per user, the FIRST fromType event and the FIRST toType event at
    * or after it; latency = whole seconds between them. Output is one
    * row — users, conversions, conversion rate, and the lower-median /
    * lower-p90 / max of the latency distribution, all computed
    * EXACTLY: integer-second latencies are counted per value and the
    * percentile is the smallest value whose cumulative count reaches
    * ⌈q·n⌉ (pure integer compares — `k·cum ≥ q·n` with integer cum IS
    * the ceil rule, no float rank anywhere). Two user-keyed min
    * aggregations + windows over the latency VALUE DOMAIN (bounded by
    * the observation window in seconds, never by event volume). */
  def funnelLatency(events: DataFrame, fromType: String = "signup",
                    toType: String = "purchase"): DataFrame = {
    val starts = events.filter(col("event_type") === fromType)
      .groupBy("user_id").agg(min(unix_timestamp(col("ts"))).as("t0"))
    val hits = events.filter(col("event_type") === toType)
      .select(col("user_id"), unix_timestamp(col("ts")).as("t1"))
    val lat = starts.join(hits, Seq("user_id"))
      .filter(col("t1") >= col("t0"))
      .groupBy("user_id").agg(min(col("t1") - col("t0")).as("lat"))
    val cnt = lat.groupBy("lat").agg(count(lit(1)).as("c"))
    val w = Window.orderBy("lat")
    val ranked = cnt
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    def pct(mul: Long, div: Long, out: String): Column =
      min(when(col("cum") * lit(div) >= col("n") * lit(mul), col("lat"))).as(out)
    val dist = ranked.agg(first("n").as("n_converted"),
      pct(1L, 2L, "p50_s"), pct(9L, 10L, "p90_s"), max("lat").as("max_s"))
    broadcast(starts.agg(count(lit(1)).as("n_users")))
      .crossJoin(broadcast(dist))
      .select(col("n_users"), col("n_converted"),
        round(col("n_converted").cast("double") / col("n_users").cast("double"),
          6).as("conv_rate"),
        col("p50_s"), col("p90_s"), col("max_s"))
  }

  /** Semi-structured props: extract the JSON field `k` and aggregate per
    * event type — get_json_object is codegen'd, no UDF. */
  /** Windowed z-score anomaly flags — the burst/outlier audit every
    * event pipeline runs: per (hour window, event_type) an event is
    * anomalous when its value sits more than `sigmas` sample standard
    * deviations above the window mean. One window aggregation joined
    * back on the (window, type) key — never a per-event window
    * function over the full stream — so the plan is two
    * map-side-combined passes at any event volume. Windows with < 2
    * events (stddev undefined) flag nothing. Emits only the anomalous
    * rows: (wstart, event_type, event_id, value, z) rounded 6 dp. */
  def windowAnomalies(events: DataFrame, sigmas: Double = 2.0): DataFrame = {
    val stats = events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(avg(col("value")).as("mu"), stddev_samp(col("value")).as("sd"),
        count(lit(1)).as("n"))
    events
      .select(window(col("ts"), "1 hour").as("w"), col("event_type"),
        col("event_id"), col("value"))
      .join(stats, Seq("w", "event_type"))
      .filter(col("n") >= 2 && col("sd") > 0 &&
        col("value") > col("mu") + lit(sigmas) * col("sd"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("event_id"),
        round(col("value"), 6).as("value"),
        round((col("value") - col("mu")) / col("sd"), 6).as("z"))
      .orderBy("wstart", "event_type", "event_id")
  }

  /** Exponentially time-decayed activity score per user — the
    * recency-weighted engagement feature (half-life form: weight
    * 2^(−age/halfLife) relative to the stream's max timestamp, so the
    * score is a pure function of the data, reproducible across runs):
    * score(u) = Σ value·2^(−age_hours/halfLifeHours). One 1-row
    * broadcast of the max timestamp + one map-side-combined sum —
    * no per-user ordering, no window function. */
  def decayScore(events: DataFrame, halfLifeHours: Double = 24.0): DataFrame = {
    val tmax = events.agg(max(unix_timestamp(col("ts"))).as("tmax"))
    events
      .select(col("user_id"), col("value"), unix_timestamp(col("ts")).as("t"))
      .crossJoin(broadcast(tmax))
      .groupBy("user_id")
      .agg(round(sum(col("value") *
        pow(lit(2.0), -(col("tmax") - col("t")).cast("double") /
          lit(halfLifeHours * 3600.0))), 6).as("score"))
      .orderBy("user_id")
  }

  /** Weekly cohort retention: users bucketed by first-activity week
    * (their cohort), counted per distinct active week offset from it —
    * the classic growth triangle, and the engagement rollup a
    * training-data pipeline derives from interaction logs.
    *
    * Scale: pure integer epoch-week arithmetic (floor(epoch/604800) —
    * no calendar functions, so every engine and timezone agrees); one
    * distinct over (user, week) bounds all later traffic at
    * |users|·|weeks|; the cohort min is a map-side-combined groupBy; the
    * final aggregate counts the already-deduped frame, so output is at
    * most weeks² rows. */
  def retention(events: DataFrame): DataFrame = {
    val uw = events.select(col("user_id"),
        floor(unix_timestamp(col("ts")) / lit(604800L)).cast("long").as("wk"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    uw.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).cast("long").as("users"))
  }

  /** CUSUM change-point detection over hourly event-rate series, one
    * series per event type (Page 1954). The one-sided recurrence
    * S_i = max(0, S_{i−1} + d_i) is NOT a prefix sum — but it has the
    * closed form S_i = P_i − min(0, min_{j≤i} P_j) over the plain
    * prefix sums P of the drifts d, so both sides (rate-up and
    * rate-down) compute as ordinary windowed sum + running min: fully
    * codegen'd, no recursion, no per-group iteration.
    *
    * Determinism: the slack is k·mean and the alarm threshold h·mean
    * (count units — mean-proportional, no stddev), so with integer
    * hourly counts the whole recurrence is EXACT INTEGER arithmetic
    * after scaling by 2n (d_i·2n = 2n·c_i − (2+2k)·Σc, integral for
    * half-integer k): prefix sums, running mins and alarm compares all
    * run in BIGINT, bit-stable cross-engine, with one final double
    * division (S′/2n) for the reported score. Overflow headroom:
    * |S′| ≤ 2n·Σc — at 10⁶ hours × 10⁹ events total that is ~2·10²⁴…
    * so production callers with extreme volumes pre-divide counts;
    * for event streams up to ~10⁶ rows/hour·10⁵ hours it fits 2⁶³.
    *
    * Scale: one map-side-combined (type, hour) count, then windows
    * partitioned by event_type whose partition size is the series
    * length (#hours in the data window — time-bounded, never
    * data-volume-bounded). */
  def cusum(events: DataFrame, k2: Long = 1L, h2: Long = 8L): DataFrame = {
    // k = k2/2 slack, h = h2/2 alarm, in units of the per-type mean.
    val w = org.apache.spark.sql.expressions.Window
    val perType = w.partitionBy("etype")
    val ordered = perType.orderBy("hr")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val hc = events
      .select(col("event_type").as("etype"),
        floor(unix_timestamp(col("ts")) / lit(3600L)).cast("long").as("hr"))
      .groupBy("etype", "hr").agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("n", count(lit(1)).over(perType).cast("long"))
      .withColumn("tot", sum("cnt").over(perType).cast("long"))
    // Scaled drifts: up-side d⁺·2n = 2n·c − (2+k2)·Σc ; down-side
    // d⁻·2n = (2−k2)·Σc − 2n·c. Alarm at S′ > h2·Σc (= h·mean·2n).
    val dUp = lit(2L) * col("n") * col("cnt") - lit(2L + k2) * col("tot")
    val dDn = lit(2L - k2) * col("tot") - lit(2L) * col("n") * col("cnt")
    val scored = hc
      .withColumn("pu", sum(dUp).over(ordered))
      .withColumn("pd", sum(dDn).over(ordered))
      .withColumn("su", col("pu") - least(min(col("pu")).over(ordered), lit(0L)))
      .withColumn("sd", col("pd") - least(min(col("pd")).over(ordered), lit(0L)))
    scored.select(col("etype").as("event_type"), col("hr"), col("cnt"),
        round(col("su").cast("double") / (lit(2L) * col("n")), 6).as("s_up"),
        round(col("sd").cast("double") / (lit(2L) * col("n")), 6).as("s_down"),
        (col("su") > lit(h2) * col("tot") ||
          col("sd") > lit(h2) * col("tot")).cast("long").as("alarm"))
      .orderBy("event_type", "hr")
  }

  /** Online CUSUM against a FIXED hourly-rate target μ0 (the classic
    * Page test form a monitor runs: the reference level is a known
    * target, not estimated from the series — so the statistic is
    * incremental and needs no global pass). Exact integer arithmetic
    * via 2-scaling (half-integer slack k = k2/2, alarm at h2/2·μ0),
    * same prefix-sum − running-min closed form as [[cusum]]. The
    * streaming twin is [[cusumOnlineSteps]]; parity is spec-pinned on
    * completed hours. */
  def cusumOnlineBatch(events: DataFrame, mu0: Long = 5L,
                       k2: Long = 1L, h2: Long = 8L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val ordered = w.partitionBy("etype").orderBy("hr")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val hc = events
      .select(col("event_type").as("etype"),
        floor(unix_timestamp(col("ts")) / lit(3600L)).cast("long").as("hr"))
      .groupBy("etype", "hr").agg(count(lit(1)).cast("long").as("cnt"))
    val dUp = lit(2L) * col("cnt") - lit((2L + k2) * mu0)
    val dDn = lit((2L - k2) * mu0) - lit(2L) * col("cnt")
    hc.withColumn("pu", sum(dUp).over(ordered))
      .withColumn("pd", sum(dDn).over(ordered))
      .withColumn("su", col("pu") - least(min(col("pu")).over(ordered), lit(0L)))
      .withColumn("sd", col("pd") - least(min(col("pd")).over(ordered), lit(0L)))
      .select(col("etype").as("event_type"), col("hr"), col("cnt"),
        round(col("su").cast("double") / 2.0, 6).as("s_up"),
        round(col("sd").cast("double") / 2.0, 6).as("s_down"),
        (col("su") > lit(h2 * mu0) || col("sd") > lit(h2 * mu0))
          .cast("long").as("alarm"))
      .orderBy("event_type", "hr")
  }

  final case class CusumRow(event_type: String, hr: Long, cnt: Long,
                            s_up: Double, s_down: Double, alarm: Long)
  final case class CusumState(hr: Long, cnt: Long, pu: Long, minU: Long,
                              pd: Long, minD: Long)

  /** Streaming twin of [[cusumOnlineBatch]]: one tiny state row per
    * event type (current open hour's partial count + the two prefix
    * accumulators and their running minima — the closed form carries
    * O(1) state). Each micro-batch tallies its events per hour, closes
    * every hour strictly before the newest seen, and keeps the newest
    * open — an hour emits exactly once, when it completes. Works
    * identically in batch mode except the final open hour is withheld
    * (spec-pinned against the batch twin on completed hours). */
  def cusumOnlineSteps(events: Dataset[Event], mu0: Long = 5L,
                       k2: Long = 1L, h2: Long = 8L): Dataset[CusumRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    def close(st: CusumState): (CusumRow, CusumState) = {
      val pu = st.pu + 2L * st.cnt - (2L + k2) * mu0
      val pd = st.pd + (2L - k2) * mu0 - 2L * st.cnt
      val minU = math.min(st.minU, math.min(pu, 0L))
      val minD = math.min(st.minD, math.min(pd, 0L))
      val su = pu - minU; val sd = pd - minD
      (CusumRow("", st.hr, st.cnt,
        math.rint(su / 2.0 * 1e6) / 1e6, math.rint(sd / 2.0 * 1e6) / 1e6,
        if (su > h2 * mu0 || sd > h2 * mu0) 1L else 0L),
        CusumState(st.hr, 0L, pu, minU, pd, minD))
    }
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (etype, it, state: GroupState[CusumState]) =>
          val tally = scala.collection.mutable.SortedMap.empty[Long, Long]
          it.foreach { e =>
            val hr = e.ts.getTime / 3600000L
            tally(hr) = tally.getOrElse(hr, 0L) + 1L
          }
          if (tally.isEmpty) Iterator.empty
          else {
            var st = state.getOption.getOrElse(
              CusumState(tally.head._1, 0L, 0L, 0L, 0L, 0L))
            val out = Seq.newBuilder[CusumRow]
            tally.foreach { case (hr, c) =>
              // a newer hour closes the open one (silent hours in the
              // gap stay absent — the batch twin has no row for them
              // either); an hour older than the open one arrived after
              // its close and is dropped, watermark-style
              if (hr > st.hr) {
                val (row, next) = close(st)
                out += row.copy(event_type = etype)
                st = CusumState(hr, 0L, next.pu, next.minU, next.pd, next.minD)
              }
              if (hr >= st.hr) st = st.copy(cnt = st.cnt + c)
            }
            state.update(st)
            out.result().iterator
          }
      }
  }

  /** Temporal distribution drift: per epoch-day KL divergence of the
    * day's event-type mix against the whole stream's mix — the
    * monitoring signal that catches a traffic-composition shift (bot
    * burst, instrumentation change) even when total volume looks
    * normal. KL(P_day ‖ P_global) = Σ_type p·ln(p/q); a type absent
    * from a day contributes 0 (lim p→0), and every day-present type
    * exists globally, so the sum is always finite.
    *
    * Scale: one map-side-combined (day, type) count; day totals and
    * the global mix are |days|- and |types|-bounded re-aggregates
    * (global side gate-broadcast); final roll-up keyed by day. Integer
    * epoch-day arithmetic — no calendar functions. */
  def typeDrift(events: DataFrame): DataFrame = {
    val dt = events
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("day"),
        col("event_type").as("etype"))
      .groupBy("day", "etype").agg(count(lit(1)).cast("long").as("cnt"))
      .localCheckpoint()
    val dayTot = dt.groupBy("day").agg(sum("cnt").cast("long").as("dtot"))
    val glob = dt.groupBy("etype").agg(sum("cnt").cast("long").as("gcnt"))
    val gTot = dt.agg(sum("cnt").cast("long").as("gtot"))
    val p = col("cnt").cast("double") / col("dtot")
    val q = col("gcnt").cast("double") / col("gtot")
    dt.join(dayTot, Seq("day"))
      .join(broadcast(glob), Seq("etype"))
      .crossJoin(broadcast(gTot))
      .groupBy(col("day"), col("dtot").as("n_events"))
      .agg(round(sum(p * log(p / q)), 6).as("kl"))
      .orderBy("day")
  }

  /** Sample autocorrelation of the DAILY event-count series at lags
    * 1..maxLag — "does volume today predict volume tomorrow / next
    * week": the seasonality screen run before alerting on volume
    * anomalies. Missing days count 0 via a sequence-generated day grid
    * (the series is as long as the OBSERVATION WINDOW, not the event
    * count, so the single ordered window is bounded by the time domain
    * — the len_histogram class of unpartitioned window). Centering is
    * exact-integer: with S = Σc and D days, (D·c_d − S) is a BIGINT and
    * r_k = Σ(D·c_d − S)(D·c_{d+k} − S) / Σ(D·c_d − S)² — the D² factors
    * cancel, so no floating mean enters the sums (at suite scales the
    * products stay far below 2⁶³; a corpus with >10⁹ events/day would
    * switch the centered terms to doubles). Constant series → NULL r. */
  def dailyAcf(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val dc = events
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("day"))
      .groupBy("day").agg(count(lit(1)).cast("long").as("c"))
    val grid = dc.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val series = grid.join(dc, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val lagged = series.select(col("c") +:
      (1 to maxLag).map(k => lead("c", k).over(w).as(s"c$k")): _*)
    val stats = series.agg(sum("c").as("s"), count(lit(1)).as("d"))
    val cen = col("d") * col("c") - col("s")
    def cenK(k: Int) = col("d") * col(s"c$k") - col("s")
    val aggCols = sum(cen * cen).as("den") +:
      (1 to maxLag).map(k => sum(cen * cenK(k)).as(s"num$k"))
    val aggRow = lagged.crossJoin(broadcast(stats))
      .agg(aggCols.head, aggCols.tail: _*)
    // one explode off the single aggregate row — a union of per-lag
    // selects would re-execute the whole series plan per lag
    aggRow.select(explode(array((1 to maxLag).map { k =>
        struct(lit(k.toLong).as("lag"),
          round(when(col("den") > 0L,
            col(s"num$k").cast("double") / col("den").cast("double")), 6)
            .as("r"))
      }: _*)).as("s"))
      .select(col("s.lag").as("lag"), col("s.r").as("r"))
      .orderBy("lag")
  }

  /** Stationary distribution of the [[eventTransitions]] Markov chain
    * — where user behavior settles in the long run: the one-vector
    * summary that turns the transition matrix into "P(user is doing X
    * at steady state)", the standard prior for session simulation and
    * anomaly baselines. Fixed `iterations` power steps from uniform;
    * types with NO outgoing transition (only ever a session's last
    * event) redistribute their mass uniformly — the PageRank dangling
    * convention, keeping Σπ = 1 exactly.
    *
    * Scale: the corpus-sized work is the one per-user LEAD window +
    * (from, to) count shuffle. The matrix itself is |types|² — bounded
    * by the TYPE DOMAIN, corpus-independent — so the iteration runs on
    * the driver over the collected matrix (the BPE-merge-table class
    * of driver-sized model artifact; a distributed |types|-row
    * fixpoint would be pure scheduler floor, cf. Tuning's gate note). */
  def stationaryDist(events: DataFrame, iterations: Int = 20): DataFrame = {
    require(iterations >= 1, "stationaryDist needs >= 1 iteration")
    val spark = events.sparkSession
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val cnt = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("nt", lead("event_type", 1).over(byUser))
      .filter(col("nt").isNotNull)
      .groupBy(col("event_type").as("f"), col("nt").as("t"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val types = events.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted
    val k = types.length
    val ix = types.zipWithIndex.toMap
    val rowTot = new Array[Long](k)
    cnt.foreach { case ((f, _), n) => rowTot(ix(f)) += n }
    // p(i)(j) only for rows with outgoing mass; others are dangling
    val p = Array.fill(k, k)(0.0)
    cnt.foreach { case ((f, t), n) =>
      p(ix(f))(ix(t)) = n.toDouble / rowTot(ix(f)).toDouble
    }
    var x = Array.fill(k)(1.0 / k.toDouble)
    for (_ <- 1 to iterations) {
      val acc = new Array[Double](k)
      var dang = 0.0
      var i = 0
      while (i < k) {
        if (rowTot(i) == 0L) dang += x(i)
        else {
          var j = 0
          while (j < k) { acc(j) += x(i) * p(i)(j); j += 1 }
        }
        i += 1
      }
      x = acc.map(_ + dang / k.toDouble)
    }
    import spark.implicits._
    types.zip(x).map { case (t, v) => (t, math.rint(v * 1e6) / 1e6) }
      .toSeq.toDF("event_type", "pi")
  }

  /** EWMA-smoothed daily event volume, α = ½, kernel truncated at
    * `window` days — the denoised series an on-call dashboard plots
    * next to [[dailyAnomalies]]' raw z-scores. α = ½ makes every
    * weight a power of two, so the whole smoother is EXACT integer
    * arithmetic: S_t = Σ_{k<m} x_{t−k}·2^{w−1−k} (BIGINT) over the
    * m = min(t+1, w) available lags, normalized by the included
    * weight mass 2^w − 2^{w−m} — early days renormalize instead of
    * biasing toward 0, and both engines see bit-identical integers
    * until the single final division. Same day-grid + time-domain-
    * bounded ordered window as [[dailyAcf]] (missing days count 0);
    * nothing scales with the event count past the first count. */
  def ewmaDaily(events: DataFrame, window: Int = 30): DataFrame = {
    require(window >= 1 && window <= 62, "ewma window must be in [1,62]")
    val dc = events
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("day"))
      .groupBy("day").agg(count(lit(1)).cast("long").as("c"))
    val grid = dc.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val series = grid.join(dc, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val sScaled = (0 until window).map { k =>
        coalesce(lag("c", k).over(w), lit(0L)) * lit(1L << (window - 1 - k))
      }.reduce(_ + _)
    val m = least(row_number().over(w).cast("long"), lit(window.toLong))
    series
      .select(col("day"), col("c"), sScaled.as("s"), m.as("m"))
      .select(col("day"), col("c"),
        round(col("s").cast("double") /
          (lit(1L << window) -
            expr(s"shiftleft(CAST(1 AS BIGINT), CAST($window - m AS INT))"))
            .cast("double"), 6).as("ewma"))
      .orderBy("day")
  }

  /** Top-k frequent 3-step behavioral paths: each user's event-type
    * sequence (ordered by ts, event_id) mined for consecutive
    * type-trigrams — one step beyond the [[eventTransitions]] bigram
    * matrix, the shortest pattern that distinguishes "view→click→
    * purchase" funnels from "view→click→view" loops.
    *
    * Scale: one user-partitioned window (two LEADs — per-user
    * partition, bounded by a user's own history) + one
    * map-side-combined trigram count bounded by |types|³ groups; the
    * top-k is a TakeOrdered with a full unique-key tiebreak. */
  def eventPaths(events: DataFrame, k: Int = 25): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"),
        lead(col("event_type"), 1).over(w).as("t2"),
        lead(col("event_type"), 2).over(w).as("t3"))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("t1").asc, col("t2").asc, col("t3").asc)
      .limit(k)
  }

  /** Burstiness profile of each event-type's hourly rate series:
    * Fano factor (variance/mean — 1 for a Poisson process, ≫1 for
    * bursty arrivals) and the Goh–Barabási burstiness coefficient
    * B = (σ−μ)/(σ+μ) ∈ (−1, 1). The series is DENSIFIED over the
    * type's own [min, max] hour range (a missing hour is a 0-count
    * observation — dropping zeros would bias both statistics toward
    * Poisson), via a per-type sequence explode, bounded by the time
    * window, never by data volume.
    *
    * Scale: one map-side-combined (type, hour) count; the densify
    * explode is |types|·|hours| rows; one final per-type aggregate.
    * Types with a single observed hour emit NULL stats (n < 2). */
  def burstiness(events: DataFrame): DataFrame = {
    val hc = events
      .select(col("event_type").as("etype"),
        floor(unix_timestamp(col("ts")) / lit(3600L)).cast("long").as("hr"))
      .groupBy("etype", "hr").agg(count(lit(1)).cast("long").as("cnt"))
    val spans = hc.groupBy("etype")
      .agg(min("hr").as("h0"), max("hr").as("h1"))
    val dense = spans
      .select(col("etype"), explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(hc, Seq("etype", "hr"), "left_outer")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
    dense.groupBy(col("etype").as("event_type"))
      .agg(count(lit(1)).cast("long").as("n_hours"),
        round(avg("cnt"), 6).as("mean_rate"),
        round(var_samp("cnt") / avg("cnt"), 6).as("fano"),
        round((stddev_samp("cnt") - avg("cnt")) /
          (stddev_samp("cnt") + avg("cnt")), 6).as("burstiness"))
      .orderBy("event_type")
  }

  final case class TransitionStep(user_id: Long, from_type: String,
                                  to_type: String)
  final case class LastEvent(ts: Long, event_id: Long, event_type: String)

  /** Streaming twin of [[eventTransitions]]'s step extraction: one
    * tiny (ts, event_id, type) state row per user, each micro-batch
    * sorted within itself and chained onto the carried last event —
    * transitions across micro-batch boundaries come out exactly once.
    * Feed the steps into any downstream aggregation (the batch
    * (from, to) count is the oracle-checked form). Works identically
    * in batch mode (state starts empty), which is what the parity
    * spec pins. */
  def transitionSteps(events: Dataset[Event]): Dataset[TransitionStep] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, TransitionStep](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[LastEvent]) =>
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var last = state.getOption.orNull
          val out = Seq.newBuilder[TransitionStep]
          evs.foreach { e =>
            if (last != null)
              out += TransitionStep(uid, last.event_type, e.event_type)
            last = LastEvent(e.ts.getTime, e.event_id, e.event_type)
          }
          if (last != null) state.update(last)
          out.result().iterator
      }
  }

  final case class PathStep(user_id: Long, t1: String, t2: String,
                            t3: String)
  final case class Last2(ty1: String, ty2: String)

  /** Streaming twin of [[eventPaths]]'s trigram extraction: one
    * two-slot state row per user (the previous TWO event types), each
    * micro-batch sorted within itself and chained onto the carried
    * pair — a trigram spanning a micro-batch boundary emits exactly
    * once, same contract as [[transitionSteps]]. Downstream count +
    * top-k reproduces the batch q_event_paths result (parity
    * spec-pinned). */
  def pathSteps(events: Dataset[Event]): Dataset[PathStep] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Last2, PathStep](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (uid, it, state: GroupState[Last2]) =>
          val evs = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.getOrElse(Last2(null, null))
          val out = Seq.newBuilder[PathStep]
          evs.foreach { e =>
            if (st.ty1 != null && st.ty2 != null)
              out += PathStep(uid, st.ty1, st.ty2, e.event_type)
            st = Last2(st.ty2, e.event_type)
          }
          if (st.ty2 != null) state.update(st)
          out.result().iterator
      }
  }

  /** RFM segmentation (recency / frequency / monetary quintiles —
    * the classic user-value grid): per user, hours since last
    * activity relative to the stream's max timestamp, event count,
    * and value sum, each scored 1..nTiles with 5 = best (most recent,
    * most frequent, highest spend), plus the combined RFM segment
    * code.
    *
    * Scale: one map-side-combined groupBy(user) + a broadcast 1-row
    * max; the three NTILEs run over the narrow per-user aggregate
    * (|users| rows of 4 columns), not the event stream — same
    * narrow-frame-sort caveat and quantile-threshold production path
    * as [[graft.pipeline.Corpus.pplBuckets]]. Integer-second recency
    * and 6-dp monetary keep every score engine-stable; all NTILE
    * orders carry a user_id tiebreak. */
  def rfm(events: DataFrame, nTiles: Int = 5): DataFrame = {
    require(nTiles >= 2, "rfm needs nTiles >= 2")
    val tmax = events.agg(max(unix_timestamp(col("ts"))).as("tmax"))
    val per = events.groupBy("user_id").agg(
        max(unix_timestamp(col("ts"))).as("tlast"),
        count(lit(1)).as("frequency"),
        round(sum("value"), 6).as("monetary"))
      .crossJoin(broadcast(tmax))
      .select(col("user_id"),
        (col("tmax") - col("tlast")).as("recency_s"),
        col("frequency"), col("monetary"))
    // Three dual-regime global NTILEs (graft.ops.Ranks): under the
    // gate each is the exact single-window NTILE the oracle mirrors;
    // past the gate each is the range-rank shuffle plan — never a
    // |users|-sized single task.
    val r1 = graft.ops.Ranks.globalNtile(per, nTiles,
      Seq(col("recency_s").desc, col("user_id").asc), "r")
    val r2 = graft.ops.Ranks.globalNtile(r1, nTiles,
      Seq(col("frequency").asc, col("user_id").asc), "f")
    graft.ops.Ranks.globalNtile(r2, nTiles,
        Seq(col("monetary").asc, col("user_id").asc), "m")
      .withColumn("segment",
        (col("r") * 100L + col("f") * 10L + col("m")).cast("long"))
  }

  /** K-step windowed funnel (the multi-step generalization of
    * [[funnel]], ClickHouse-windowFunnel-style semantics): a user
    * reaches level k when some step-1 event anchors a strictly-ordered
    * chain of the first k step types, all within `withinHours` of the
    * anchor. For a fixed anchor the greedy earliest-next-event chain
    * dominates any other, so per level ONE bucketized range join +
    * per-anchor min is exact, never a per-user sequence scan.
    *
    * Scale: each level is [[graft.ops.RangeJoin.pointInInterval]] (a
    * (keys, bucket) equi-join — time spreads hot users) followed by a
    * map-side-combined min; the anchor frame only ever SHRINKS level
    * over level. Output is one k-row summary. */
  def funnelSteps(events: DataFrame, steps: Seq[String],
                  withinHours: Int = 168): DataFrame = {
    require(steps.size >= 2, "funnelSteps needs at least two steps")
    require(withinHours >= 1, s"withinHours must be >= 1, got $withinHours")
    var frontier = events.filter(col("event_type") === steps.head)
      .select(col("event_id").as("anchor_id"), col("user_id"),
        col("ts").as("t1"), col("ts").as("cur"))
    def levelCount(level: Int, step: String, f: DataFrame): DataFrame =
      f.agg(countDistinct("user_id").as("n_users"))
        .select(lit(level.toLong).as("level"), lit(step).as("step"),
          col("n_users"))
    var out = levelCount(1, steps.head, frontier)
    for ((st, i) <- steps.tail.zipWithIndex) {
      val pts = events.filter(col("event_type") === st)
        .select(col("user_id"), col("ts").as("pt"))
      val withEnd = frontier.withColumn("endt",
        col("t1") + expr(s"INTERVAL $withinHours HOURS"))
      // bucket = window length, the same contract [[funnel]] uses:
      // each anchor explodes into exactly 2 bucket replicas; the
      // residual filter stays user-local either way
      val bucketSeconds = withinHours * 3600L
      frontier = graft.ops.RangeJoin
        .pointInInterval(pts, withEnd, Seq("user_id"), "pt", "cur", "endt",
          bucketSeconds)
        .filter(col("pt") > col("cur")) // strictly after the prior step
        .groupBy("anchor_id", "user_id", "t1").agg(min("pt").as("cur"))
      out = out.unionByName(levelCount(i + 2, st, frontier))
    }
    out
  }

  /** Per-user event-type transition matrix (first-order Markov): count
    * and conditional probability of each (from → to) step along every
    * user's (ts, event_id)-ordered stream — the behavioral model
    * behind next-action prediction and session-flow dashboards.
    *
    * Scale: ONE shuffle on user_id for the lag window (the same
    * partitioning [[interArrival]] uses), then a map-side-combined
    * count over ≤ |types|² keys; the probability normalizer is a
    * window over that tiny aggregate, not the event stream. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val steps = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
    val cnt = steps
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_type")
    cnt.withColumn("p", round(col("n") / sum("n").over(byFrom), 6))
  }

  /** Day-of-week × event-type profile with lift: per (epoch-dow,
    * type), the count, the share within that weekday, and the lift of
    * that share over the type's overall share — "is Saturday really
    * purchase-heavier" with the base-rate divided out. Weekdays are
    * epoch-day mod 7 (0 = Thursday, 1970-01-01) — pure integer
    * arithmetic both engines agree on, no calendar locale. Returns
    * (dow, event_type, n, dow_share, lift).
    *
    * Scale: one 7·|types|-key count shuffle; marginals derived from
    * it; all joins broadcast-sized by construction. */
  def dowProfile(events: DataFrame): DataFrame = {
    val c = events.select(
        pmod(floor(unix_timestamp(col("ts")) / lit(86400L)), lit(7L))
          .as("dow"), col("event_type"))
      .groupBy("dow", "event_type").agg(count(lit(1)).as("n"))
    val byDow = c.groupBy("dow").agg(sum("n").as("nd"))
    val byType = c.groupBy("event_type").agg(sum("n").as("nt"))
    val tot = byType.agg(sum("nt").as("ntot"))
    c.join(broadcast(byDow), Seq("dow"))
      .join(broadcast(byType), Seq("event_type"))
      .crossJoin(broadcast(tot))
      .select(col("dow"), col("event_type"), col("n").cast("long").as("n"),
        round(col("n") / col("nd"), 6).as("dow_share"),
        round((col("n") / col("nd")) / (col("nt") / col("ntot")), 6)
          .as("lift"))
      .orderBy("dow", "event_type")
  }

  /** User-lifespan histogram: per user the active span (last − first
    * epoch-day + 1) and active-day count, rolled into lifecycle
    * bands with mean span, mean active days, and activity density
    * (Σactive/Σspan) — "are users here for a day, a week, or the
    * duration, and how densely do they show up". Returns (bucket,
    * n_users, share, mean_span_d, mean_active_d, density).
    *
    * Scale: one (day,user) distinct + one per-user min/max/count;
    * 4-key rollup, all sums exact BIGINTs. */
  def userLifespan(events: DataFrame): DataFrame = {
    val du = events.select(
      floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
      col("user_id")).distinct()
    val per = du.groupBy("user_id")
      .agg((max("day") - min("day") + 1L).as("span"),
        count(lit(1)).as("active"))
    val b = per.select(
      when(col("span") === 1L, "a_1d")
        .when(col("span") <= 7L, "b_2_7d")
        .when(col("span") <= 28L, "c_8_28d")
        .otherwise("d_gt_28d").as("bucket"),
      col("span"), col("active"))
    val agg = b.groupBy("bucket")
      .agg(count(lit(1)).as("n_users"), sum("span").as("ssum"),
        sum("active").as("asum"))
    agg.crossJoin(broadcast(agg.agg(sum("n_users").as("tot"))))
      .select(col("bucket"), col("n_users").cast("long").as("n_users"),
        round(col("n_users").cast("double") / col("tot").cast("double"),
          6).as("share"),
        round(col("ssum").cast("double") / col("n_users").cast("double"),
          6).as("mean_span_d"),
        round(col("asum").cast("double") / col("n_users").cast("double"),
          6).as("mean_active_d"),
        round(col("asum").cast("double") / col("ssum").cast("double"), 6)
          .as("density"))
      .orderBy("bucket")
  }

  /** Kaplan–Meier survival curve (Kaplan & Meier 1958) over user
    * lifetimes with right-censoring — the estimator [[userLifespan]]'s
    * band histogram cannot give: "what fraction of users survive past
    * t days, correcting for the users we haven't watched long enough".
    * A user's lifetime is their active span in epoch days (last −
    * first + 1); a user whose last activity is within `censorDays` of
    * the corpus horizon is right-CENSORED (still alive as far as the
    * data can tell), everyone else is an observed churn event. At each
    * distinct lifetime t: n_risk = users with lifetime ≥ t, n_event =
    * churns at exactly t, and Ŝ(t) = ∏_{tᵢ≤t} (1 − dᵢ/nᵢ) — computed
    * as exp(Σ ln((n−d)/n)) with the d = n absorbing step pinned to
    * exactly 0 (both engines guard the ln(0)).
    *
    * Scale: one (day, user) distinct + one per-user min/max — the
    * userLifespan shuffles — then everything runs on the distinct-
    * lifetime frame, bounded by the OBSERVATION WINDOW in days, never
    * by user or event volume; its cumulative windows are whitelisted
    * on that bound. Returns (t_days, n_risk, n_event, n_censored,
    * survival) ordered by t_days. */
  /** Shared risk-set frame for the survival family: per distinct
    * lifetime t the event count `d`, censored count `cns`, and
    * `n_risk` (users with lifetime ≥ t). No (day, user) distinct —
    * per-user min/max day is identical on raw events — so the shape
    * is one scan, ONE user-keyed shuffle (map-side combined), with
    * the per-user frame pinned so the horizon aggregate and the
    * lifetime rollup don't re-run the scan, then cumulatives on the
    * observation-window-bounded lifetime frame. */
  private def riskSets(events: DataFrame, censorDays: Int): DataFrame = {
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val per = events.select(
        floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        col("user_id"))
      .groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .localCheckpoint()
    // horizon = max last-active day over users ≡ global max event day
    val hor = per.agg(max("d1").as("h"))
    val lab = per.crossJoin(broadcast(hor))
      .select((col("d1") - col("d0") + 1L).as("t"),
        (col("d1") <= col("h") - censorDays).cast("long").as("ev"))
    val g = lab.groupBy("t")
      .agg(sum("ev").as("d"), sum(lit(1L) - col("ev")).as("cns"))
      .localCheckpoint() // lifetime-domain bounded (≤ observation days)
    val tot = g.agg((sum("d") + sum("cns")).as("n_total"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val nRisk = col("n_total") -
      coalesce(sum(col("d") + col("cns")).over(wPrev), lit(0L))
    g.crossJoin(broadcast(tot)).withColumn("n_risk", nRisk)
  }

  def survival(events: DataFrame, censorDays: Int = 3): DataFrame = {
    val base = riskSets(events, censorDays)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lnTerm = when(col("d") === 0L, lit(0.0))
      .when(col("d") === col("n_risk"), lit(0.0)) // absorbed: guarded below
      .otherwise(log((col("n_risk") - col("d")).cast("double") /
        col("n_risk").cast("double")))
    base
      .withColumn("absorbed",
        max((col("d") === col("n_risk")).cast("int")).over(wCum))
      .select(col("t").cast("long").as("t_days"),
        col("n_risk").cast("long").as("n_risk"),
        col("d").cast("long").as("n_event"),
        col("cns").cast("long").as("n_censored"),
        round(when(col("absorbed") === 1, lit(0.0))
          .otherwise(exp(sum(lnTerm).over(wCum))), 6).as("survival"))
      .orderBy("t_days")
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) on the
    * [[survival]] risk sets: Ĥ(t) = Σ_{tᵢ≤t} dᵢ/nᵢ with variance
    * Σ dᵢ/nᵢ² — the additive twin of Kaplan–Meier (Ŝ ≈ e^{−Ĥ}) and
    * the estimator of choice when hazard INCREMENTS (churn intensity
    * per lifetime day) are the quantity being read, since sums of
    * exact-operand divisions carry no product underflow. Same
    * censoring rule, same single-scan single-shuffle shape, same
    * bounded-lifetime cumulatives. Returns (t_days, n_risk, n_event,
    * n_censored, hazard, var_hazard) ordered by t_days. */
  def hazard(events: DataFrame, censorDays: Int = 3): DataFrame = {
    val base = riskSets(events, censorDays)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nD = col("n_risk").cast("double")
    base.select(col("t").cast("long").as("t_days"),
      col("n_risk").cast("long").as("n_risk"),
      col("d").cast("long").as("n_event"),
      col("cns").cast("long").as("n_censored"),
      round(sum(col("d").cast("double") / nD).over(wCum), 6).as("hazard"),
      round(sum(col("d").cast("double") / (nD * nD)).over(wCum), 6)
        .as("var_hazard"))
      .orderBy("t_days")
  }

  /** Two-cohort log-rank test (Mantel 1966; Peto & Peto 1972) on the
    * [[survival]] lifetimes: "did arm B retain users longer than
    * arm A, censoring-aware" — the significance test every A/B
    * retention readout needs before anyone trusts a Kaplan–Meier gap.
    * Cohorts default to the id-parity assignment (user_id % 2, the
    * standard hash-bucket experiment arm); any user-level predicate
    * on the grouped frame slots in via `groupExpr`. At each distinct
    * lifetime t with dₜ > 0 events: O₁ += d₁ₜ, E₁ += dₜ·n₁ₜ/nₜ,
    * V += dₜ·(n₁ₜ/nₜ)(1 − n₁ₜ/nₜ)(nₜ − dₜ)/(nₜ − 1); z =
    * (O₁ − E₁)/√V, χ² = z². NULL z/χ² when V = 0 (degenerate arms).
    *
    * Scale: the [[survival]] shape — one events scan, one user-keyed
    * shuffle, then per-arm risk-set cumulatives on the observation-
    * window-bounded lifetime frame (whitelisted on that bound).
    * Returns one row (n_g1, n_g0, o1, e1, var_o1, z, chi2). */
  def logRank(events: DataFrame, censorDays: Int = 3,
              groupExpr: Column = pmod(col("user_id"), lit(2L)) === 1L)
      : DataFrame = {
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val per = events.select(
        floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        col("user_id"))
      .groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .localCheckpoint()
    val hor = per.agg(max("d1").as("h"))
    val lab = per.crossJoin(broadcast(hor))
      .select((col("d1") - col("d0") + 1L).as("t"),
        (col("d1") <= col("h") - censorDays).cast("long").as("ev"),
        groupExpr.cast("long").as("grp"))
    val byT = lab.groupBy("t")
      .agg(sum(col("ev") * col("grp")).as("d1g"),
        sum(col("ev") * (lit(1L) - col("grp"))).as("d0g"),
        sum((lit(1L) - col("ev")) * col("grp")).as("c1g"),
        sum((lit(1L) - col("ev")) * (lit(1L) - col("grp"))).as("c0g"))
      .localCheckpoint() // lifetime-domain bounded
    val tot = byT.agg((sum("d1g") + sum("c1g")).as("n1"),
      (sum("d0g") + sum("c0g")).as("n0"))
    val wPrev = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r = byT.crossJoin(broadcast(tot))
      .withColumn("n1r", col("n1") -
        coalesce(sum(col("d1g") + col("c1g")).over(wPrev), lit(0L)))
      .withColumn("n0r", col("n0") -
        coalesce(sum(col("d0g") + col("c0g")).over(wPrev), lit(0L)))
      .withColumn("nr", col("n1r") + col("n0r"))
      .withColumn("d", col("d1g") + col("d0g"))
    val dD = col("d").cast("double")
    val n1D = col("n1r").cast("double")
    val n0D = col("n0r").cast("double")
    val nD = col("nr").cast("double")
    val agg = r.filter(col("d") > 0L)
      .agg(first("n1").as("n_g1"), first("n0").as("n_g0"),
        sum("d1g").as("o1"),
        sum(dD * n1D / nD).as("_e1"),
        sum(when(col("nr") > 1L,
          dD * (n1D / nD) * (n0D / nD) * (nD - dD) / (nD - lit(1.0)))
          .otherwise(lit(0.0))).as("_v"))
    val z = (col("o1").cast("double") - col("_e1")) / sqrt(col("_v"))
    agg.select(col("n_g1").cast("long").as("n_g1"),
      col("n_g0").cast("long").as("n_g0"),
      col("o1").cast("long").as("o1"),
      round(col("_e1"), 6).as("e1"),
      round(col("_v"), 6).as("var_o1"),
      round(when(col("_v") > 0.0, z), 6).as("z"),
      round(when(col("_v") > 0.0, z * z), 6).as("chi2"))
  }

  /** Day-N retention (the D1/D3/D7/D14 dashboard): share of all users
    * active EXACTLY N epoch-days after their first active day —
    * the bounded-window counterpart of [[retention]]'s growth
    * triangle and [[churn]]'s week shift. Zero-retention checkpoints
    * still emit (LEFT join from the target-day frame). Returns
    * (day_n, n_users, retained, share).
    *
    * Scale: one (day,user) distinct + one per-user min + one
    * (user, day)-keyed semi-join per checkpoint (exploded, not
    * looped); output ≤ |checkpoints| rows. */
  def dayNRetention(events: DataFrame,
                    days: Seq[Int] = Seq(1, 3, 7, 14)): DataFrame = {
    require(days.nonEmpty && days.forall(_ > 0),
      s"days must be positive offsets, got $days")
    val du = events.select(
      floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
      col("user_id")).distinct()
    val first = du.groupBy("user_id").agg(min("day").as("d0"))
    val tot = first.agg(count(lit(1)).as("n_users"))
    val hits = first
      .withColumn("n", explode(array(days.map(d => lit(d.toLong)): _*)))
      .join(du, du("user_id") === first("user_id") &&
        du("day") === first("d0") + col("n"), "left_semi")
      .groupBy("n").agg(count(lit(1)).as("retained"))
    val tg = events.sparkSession.range(1)
      .select(explode(array(days.map(d => lit(d.toLong)): _*)).as("n"))
    tg.join(hits, Seq("n"), "left_outer")
      .crossJoin(broadcast(tot))
      .select(col("n").cast("long").as("day_n"),
        col("n_users").cast("long").as("n_users"),
        coalesce(col("retained"), lit(0L)).cast("long").as("retained"),
        round(coalesce(col("retained"), lit(0L)).cast("double") /
          col("n_users").cast("double"), 6).as("share"))
      .orderBy("day_n")
  }

  /** Hour-of-day × type profile with lift ([[dowProfile]]'s twin at
    * hour granularity — epoch-hour mod 24, no calendar locale): the
    * intraday load curve plus which types over-index at which hours.
    * Returns (hod, event_type, n, hod_share, lift).
    *
    * Scale: one (hod,type) map-side-combined count; the ≤24- and
    * ≤|types|-row base frames broadcast. */
  def hourProfile(events: DataFrame): DataFrame = {
    val c = events.select(
        pmod(floor(unix_timestamp(col("ts")) / lit(3600L)), lit(24L))
          .as("hod"), col("event_type"))
      .groupBy("hod", "event_type").agg(count(lit(1)).as("n"))
    val byHod = c.groupBy("hod").agg(sum("n").as("nh"))
    val byType = c.groupBy("event_type").agg(sum("n").as("nt"))
    val tot = byType.agg(sum("nt").as("ntot"))
    c.join(broadcast(byHod), Seq("hod"))
      .join(broadcast(byType), Seq("event_type"))
      .crossJoin(broadcast(tot))
      .select(col("hod"), col("event_type"), col("n").cast("long").as("n"),
        round(col("n") / col("nh"), 6).as("hod_share"),
        round((col("n") / col("nh")) / (col("nt") / col("ntot")), 6)
          .as("lift"))
      .orderBy("hod", "event_type")
  }

  /** Cohort-value (LTV) triangle: users grouped by first-seen
    * epoch-week, purchase value summed per cohort-age week, with the
    * running cumulative — the lifetime-value growth curve next to
    * [[retention]]'s activity triangle. Weekly sums round to 6 dp
    * BEFORE the cumulative, so the running sum adds the same rounded
    * sequence in age order in both engines. Returns (cohort_wk,
    * age_wk, n_buyers, wk_value, cum_value).
    *
    * Scale: one per-user min + one (cohort,age) rollup; the running
    * window partitions by cohort over ≤|ages| rows. */
  def cohortValue(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      floor(unix_timestamp(col("ts")) / lit(604800L)).as("wk"),
      col("event_type"), col("value"))
    val first = ev.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val pv = ev.filter(col("event_type") === "purchase")
      .join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("age_wk"))
      .agg(countDistinct("user_id").cast("long").as("n_buyers"),
        round(sum("value"), 6).as("wk_value"))
    val w = Window.partitionBy("cohort_wk").orderBy("age_wk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pv.withColumn("cum_value", round(sum("wk_value").over(w), 6))
      .select(col("cohort_wk").cast("long").as("cohort_wk"),
        col("age_wk").cast("long").as("age_wk"), col("n_buyers"),
        col("wk_value"), col("cum_value"))
      .orderBy("cohort_wk", "age_wk")
  }

  /** DAU/WAU stickiness per epoch-week: observed days, weekly-active
    * users, mean daily-active users and the stickiness ratio
    * mean_dau/wau — THE product-engagement headline ("what share of a
    * week's users show up on a given day"). Epoch-day/epoch-week
    * integers (no calendar locale); mean over OBSERVED days of the
    * week, so a partial tail week isn't diluted by empty days.
    * Returns (wk, n_days, wau, mean_dau, stickiness).
    *
    * Scale: one (day,user) distinct — the dominant shuffle — then
    * day- and week-bounded rollups; output ≤ |weeks| rows. */
  def stickiness(events: DataFrame): DataFrame = {
    val du = events.select(
      floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
      col("user_id")).distinct()
    val wd = du.withColumn("wk", floor(col("day") / lit(7L)))
    val daily = wd.groupBy("wk", "day").agg(count(lit(1)).as("dau"))
    val weekly = wd.select("wk", "user_id").distinct()
      .groupBy("wk").agg(count(lit(1)).as("wau"))
    daily.groupBy("wk")
      .agg(count(lit(1)).as("n_days"), sum("dau").as("dau_sum"))
      .join(weekly, Seq("wk"))
      .select(col("wk").cast("long").as("wk"),
        col("n_days").cast("long").as("n_days"),
        col("wau").cast("long").as("wau"),
        round(col("dau_sum").cast("double") / col("n_days").cast("double"),
          6).as("mean_dau"),
        round(col("dau_sum").cast("double") /
          (col("n_days") * col("wau")).cast("double"), 6).as("stickiness"))
      .orderBy("wk")
  }

  /** Behavioral-entropy profile: per-user Shannon entropy of the
    * event-type distribution, rolled up by the user's distinct-type
    * count — "how specialized is each user's behavior" (H = 0:
    * single-purpose; H → ln(types): uniform). Per-user H is
    * integerized to 1e-7 units BEFORE the cross-user mean so the
    * rollup sum is exact BIGINT arithmetic (the mmr discipline).
    * Returns (n_types, n_users, mean_entropy).
    *
    * Scale: one (user,type) count shuffle + one user rollup; output
    * ≤ |types| rows. */
  def behavioralEntropy(events: DataFrame): DataFrame = {
    val tc = events.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
    val h = log(col("n").cast("double")) -
      col("slc") / col("n").cast("double")
    val per = tc.groupBy("user_id")
      .agg(sum("c").as("n"), count(lit(1)).as("n_types"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("slc"))
      .select(col("n_types"),
        floor(h * lit(1e7) + lit(0.5)).cast("long").as("hu"))
    per.groupBy("n_types")
      .agg(count(lit(1)).cast("long").as("n_users"), sum("hu").as("husum"))
      .select(col("n_types").cast("long").as("n_types"), col("n_users"),
        round(col("husum").cast("double") /
          (col("n_users").cast("double") * lit(1e7)), 6).as("mean_entropy"))
      .orderBy("n_types")
  }

  /** Repeat-purchase interval histogram: per-user gaps between
    * consecutive purchases (exact epoch-microsecond integers,
    * event_id tiebreak) bucketed into lifecycle bands, with each
    * band's share and mean gap in hours — the repeat-rate curve
    * subscription/retention teams steer by. Returns (bucket, n_gaps,
    * share, mean_gap_h).
    *
    * Scale: one user-partitioned lag window over the purchase slice;
    * 5-key rollup. */
  def purchaseIntervals(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), ntzMicros.as("us"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val hUs = 3600L * 1000000L
    val gaps = p.withColumn("prev", lag("us", 1).over(w))
      .filter(col("prev").isNotNull)
      .select((col("us") - col("prev")).as("gap_us"))
      .select(col("gap_us"),
        when(col("gap_us") < lit(6L * hUs), "a_lt_6h")
          .when(col("gap_us") < lit(24L * hUs), "b_6h_24h")
          .when(col("gap_us") < lit(72L * hUs), "c_1d_3d")
          .when(col("gap_us") < lit(168L * hUs), "d_3d_7d")
          .otherwise("e_ge_7d").as("bucket"))
    val per = gaps.groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("gap_us").as("gsum"))
    per.crossJoin(broadcast(per.agg(sum("n").as("tot"))))
      .select(col("bucket"), col("n").cast("long").as("n_gaps"),
        round(col("n").cast("double") / col("tot").cast("double"), 6)
          .as("share"),
        round(col("gsum").cast("double") /
          (col("n").cast("double") * lit(3.6e9)), 4).as("mean_gap_h"))
      .orderBy("bucket")
  }

  /** Wall-clock epoch microseconds off the NTZ ts column —
    * tz-independent (unix_micros would reinterpret the NTZ wall clock
    * in the session zone). */
  private def ntzMicros: Column =
    expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")

  /** Batch sessionization summary: split each user's stream at
    * inactivity gaps > `gapMinutes` (exact epoch-microsecond compare,
    * event_id tiebreak), then report the session-size histogram —
    * n_sessions / share / mean events / mean duration per size band.
    * The batch twin of the streaming flatMapGroupsWithState
    * sessionizer; THE engagement-shape report ("are visits one-shot
    * bounces or long sessions").
    *
    * Scale: both windows (lag + running session counter) ride ONE
    * user_id shuffle partition sort; rollup is 4-key. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes > 0, s"gapMinutes must be positive, got $gapMinutes")
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val marked = events
      .select(col("user_id"), ntzMicros.as("us"), col("event_id"))
      .withColumn("prev", lag("us", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sess = marked.groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_ev"), (max("us") - min("us")).as("dur_us"))
    val per = sess
      .select(when(col("n_ev") === 1L, "a_1")
          .when(col("n_ev") <= 4L, "b_2_4")
          .when(col("n_ev") <= 9L, "c_5_9")
          .otherwise("d_ge_10").as("bucket"),
        col("n_ev"), col("dur_us"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_sessions"), sum("n_ev").as("ev_sum"),
        sum("dur_us").as("dur_sum"))
    per.crossJoin(broadcast(per.agg(sum("n_sessions").as("tot"))))
      .select(col("bucket"), col("n_sessions").cast("long").as("n_sessions"),
        round(col("n_sessions").cast("double") / col("tot").cast("double"),
          6).as("share"),
        round(col("ev_sum").cast("double") /
          col("n_sessions").cast("double"), 6).as("mean_events"),
        round(col("dur_sum").cast("double") /
          (col("n_sessions").cast("double") * lit(6e7)), 4)
          .as("mean_duration_min"))
      .orderBy("bucket")
  }

  /** First-touch mix: each user's FIRST event type (exact (us,
    * event_id) argmin via the min-struct trick — no row_number pass)
    * vs the type's overall event-volume share; lift > 1 = the type
    * over-indexes as an entry point — the acquisition-channel
    * fingerprint next to [[dowProfile]]'s when and
    * [[transitionMatrix]]'s what-next. Returns (event_type, n_first,
    * first_share, event_share, lift).
    *
    * Scale: one map-side-combined per-user min + one type count; the
    * two ≤|types|-row frames broadcast into the final projection. */
  def firstTouch(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"),
      ntzMicros.as("us"), col("event_id"))
    val first = e
      .groupBy("user_id")
      .agg(min(struct(col("us"), col("event_id"), col("event_type")))
        .as("f"))
      .select(col("f.event_type").as("event_type"))
      .groupBy("event_type").agg(count(lit(1)).as("n_first"))
    val vol = e.groupBy("event_type").agg(count(lit(1)).as("n_ev"))
    val tot = first.agg(sum("n_first").as("n_users"))
      .crossJoin(broadcast(vol.agg(sum("n_ev").as("n_events"))))
    first.join(vol, Seq("event_type"))
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_first").cast("long").as("n_first"),
        round(col("n_first").cast("double") / col("n_users").cast("double"),
          6).as("first_share"),
        round(col("n_ev").cast("double") / col("n_events").cast("double"),
          6).as("event_share"),
        round((col("n_first").cast("double") * col("n_events")
            .cast("double")) /
          (col("n_users").cast("double") * col("n_ev").cast("double")), 6)
          .as("lift"))
      .orderBy("event_type")
  }

  /** Type-affinity matrix: for every event-type pair, how many users
    * do BOTH, with user-level lift n_ab·n_u/(n_a·n_b) and Jaccard —
    * the cross-feature adoption map ("do purchasers also hit
    * errors?"). Returns (type_a, type_b, n_ab, lift, jaccard).
    *
    * Scale: one (user,type) distinct, then a user-keyed self-join
    * whose fan-out is ≤ C(|types|,2) per user; type totals broadcast.
    */
  def typeAffinity(events: DataFrame): DataFrame = {
    val ut = events.select("user_id", "event_type").distinct()
    val tot = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val nu = ut.agg(countDistinct("user_id").as("n_u"))
    val pairs = ut.as("x").join(ut.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(tot.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(tot.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), Seq("type_b"))
      .crossJoin(broadcast(nu))
      .select(col("type_a"), col("type_b"),
        col("n_ab").cast("long").as("n_ab"),
        round(col("n_ab").cast("double") * col("n_u").cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"),
        round(col("n_ab").cast("double") /
          (col("n_a") + col("n_b") - col("n_ab")).cast("double"), 6)
          .as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  /** Multi-touch attribution histogram: for every purchase, the count
    * of the user's clicks in the trailing `windowHours` (inclusive
    * bounds, the [[graft.ops.RangeJoin]] convention), rolled into a
    * (n_touches, n_purchases) histogram — the zero row IS the
    * unattributed-revenue share marketing argues about. Returns
    * (n_touches, n_purchases).
    *
    * Scale: the bucketized range join (never a nested loop), one
    * per-purchase count, one histogram shuffle over ≤max-touch keys. */
  def attribution(events: DataFrame, windowHours: Int = 168): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        col("ts").as("pts"),
        (col("ts") - expr(s"INTERVAL $windowHours HOURS")).as("wstart"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val touched = graft.ops.RangeJoin
      .pointInInterval(clicks, purchases, Seq("user_id"), "cts",
        "wstart", "pts")
      .groupBy("pid").agg(count(lit(1)).as("t"))
    purchases.select("pid").join(touched, Seq("pid"), "left")
      .select(coalesce(col("t"), lit(0L)).as("n_touches"))
      .groupBy("n_touches").agg(count(lit(1)).cast("long").as("n_purchases"))
      .orderBy("n_touches")
  }

  /** Rolling daily-volume report: per observed day, the event count,
    * its 7-observed-day trailing mean/min/max, and the day-over-day
    * delta — the on-call dashboard row (is today's volume inside the
    * recent envelope). ROWS-frame over observed days (gaps don't pad),
    * mean derived explicitly as sum/count so both engines divide the
    * same exact BIGINTs. Returns (day, n, ma7, min7, max7, delta).
    *
    * Scale: the windows run on the |days| frame — time-bounded, not
    * event-bounded; one count shuffle feeds everything. */
  def rollingVolume(events: DataFrame): DataFrame = {
    val daily = events.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w7 = Window.orderBy("day").rowsBetween(-6, 0)
    val w = Window.orderBy("day")
    daily.select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n").cast("long").as("n"),
        round(sum("n").over(w7).cast("double") /
          count("n").over(w7).cast("double"), 6).as("ma7"),
        min("n").over(w7).cast("long").as("min7"),
        max("n").over(w7).cast("long").as("max7"),
        (col("n") - lag("n", 1).over(w)).cast("long").as("delta"))
      .orderBy("day")
  }

  /** Weekly churn: per epoch-week (floor(epoch/604800) — identical
    * integer weeks in both engines, no calendar-week convention to
    * disagree on), the active-user count, how many of them return the
    * NEXT week, and the churn complement — the subscription-health
    * number retention triangles bury. The last observed week is
    * excluded (its "next week" hasn't happened). Returns (wk, active,
    * retained_next, churned_next, churn_rate).
    *
    * Scale: distinct (week, user) then one self-semi-join keyed on
    * (week, user) — per-key fan-out 1; |weeks|-row output. */
  def churn(events: DataFrame): DataFrame = {
    val uw = events.select(
      floor(unix_timestamp(col("ts")) / lit(604800L)).as("wk"),
      col("user_id")).distinct()
    val nextShift = uw.select((col("wk") - 1).as("wk"),
      col("user_id").as("user_id"))
    val act = uw.groupBy("wk").agg(count(lit(1)).as("active"))
    val ret = uw.join(nextShift, Seq("wk", "user_id"), "left_semi")
      .groupBy("wk").agg(count(lit(1)).as("retained"))
    val maxWk = act.agg(max("wk").as("mx"))
    act.join(ret, Seq("wk"), "left")
      .crossJoin(broadcast(maxWk))
      .filter(col("wk") < col("mx"))
      .select(col("wk").cast("long").as("wk"),
        col("active").cast("long").as("active"),
        coalesce(col("retained"), lit(0L)).cast("long").as("retained_next"),
        (col("active") - coalesce(col("retained"), lit(0L))).cast("long")
          .as("churned_next"),
        round((col("active") - coalesce(col("retained"), lit(0L)))
          .cast("double") / col("active").cast("double"), 6).as("churn_rate"))
      .orderBy("wk")
  }

  /** Activity Lorenz curve by user decile: users ranked by event count
    * (the Gini's underlying curve, kept as the full 10-point profile —
    * "the top decile generates X% of events" is the capacity-planning
    * and abuse-screening number). Deciles come from the exact
    * half-unit rank formula over the per-COUNT-VALUE user frame, so
    * ties share a decile and no corpus-grain sort ever runs; shares
    * are exact BIGINT sums divided once at output. Returns (decile,
    * n_users, events, event_share, cum_share).
    *
    * Scale: one user-keyed count shuffle, then all windows run on the
    * distinct-count-value frame (bounded by max activity, not user
    * count) and the 10-row decile frame. */
  def lorenz(events: DataFrame): DataFrame = {
    val vc = events.groupBy("user_id").agg(count(lit(1)).as("c"))
      .groupBy("c").agg(count(lit(1)).as("nu"))
    val w = Window.orderBy("c")
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val ranked = vc
      .withColumn("cumu", sum("nu").over(w))
      .withColumn("n", sum("nu").over(all))
      .select(col("c"), col("nu"),
        least(floor((lit(2L) * (col("cumu") - col("nu")) + col("nu"))
            .cast("double") / (lit(2L) * col("n")).cast("double") * lit(10.0)),
          lit(9.0)).cast("long").as("decile"))
    val dec = ranked.groupBy("decile")
      .agg(sum("nu").cast("long").as("n_users"),
        sum(col("c") * col("nu")).cast("long").as("events"))
    val wd = Window.orderBy("decile")
    dec
      .withColumn("tot", sum("events").over(all))
      .withColumn("cum", sum("events").over(wd))
      .select(col("decile"), col("n_users"), col("events"),
        round(col("events").cast("double") / col("tot"), 6).as("event_share"),
        round(col("cum").cast("double") / col("tot"), 6).as("cum_share"))
      .orderBy("decile")
  }

  /** Audience overlap between event types: Jaccard of the distinct
    * user sets of every type pair — the "are these two features the
    * same people" product question, and the event-domain mirror of
    * [[graft.pipeline.Corpus.vocabOverlap]]. Returns (type_a, type_b,
    * users_a, users_b, n_both, jaccard), a < b; zero-overlap pairs
    * drop out.
    *
    * Scale: distinct (type, user) first, then a user-keyed join with
    * ≤|types| rows per key — never user×user. */
  def audienceOverlap(events: DataFrame): DataFrame = {
    val tu = events.select(col("event_type"), col("user_id")).distinct()
    val sizes = tu.groupBy("event_type").agg(count(lit(1)).as("u"))
    tu.join(tu.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("event_type") < col("type_b"))
      .groupBy(col("event_type").as("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("u").as("users_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("u").as("users_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"),
        col("users_a").cast("long").as("users_a"),
        col("users_b").cast("long").as("users_b"),
        col("n_both").cast("long").as("n_both"),
        round(col("n_both").cast("double") /
          (col("users_a") + col("users_b") - col("n_both")), 6).as("jaccard"))
      .orderBy("type_a", "type_b")
  }

  /** Stationary distribution of the first-order event-type Markov
    * chain: P(from → to) row-normalized from the same per-user
    * consecutive-step counts as [[eventTransitions]], then π ← πP
    * iterated `iters` times from uniform, with dangling-state mass
    * (types with no outgoing step) redistributed uniformly — the
    * PageRank-without-damping fixpoint. Answers "where does user
    * attention CONVERGE", which one-step transition counts can't.
    *
    * Scale: the chain lives on the |types|² count frame (broadcast-
    * sized by construction — event-type vocabularies are small); each
    * iteration is one broadcast join + one |types|-group aggregate,
    * so the corpus is scanned exactly once no matter how many
    * iterations run. Dangling mass is recovered as 1 − Σflow (row-
    * stochastic rows sum to 1), so no per-iteration driver collect. */
  /** Shared Markov-chain build: the |types|²-bounded transition
    * probability frame, the UNROUNDED stationary vector after `iters`
    * smoothed power steps, and the state count. */
  private def markovChain(events: DataFrame,
                          iters: Int): (DataFrame, DataFrame, Long) = {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val cnt = events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val p = broadcast(
      cnt.join(cnt.groupBy("from_type").agg(sum("n").as("tot")), Seq("from_type"))
        .select(col("from_type"), col("to_type"),
          (col("n").cast("double") / col("tot").cast("double")).as("p"))
        .localCheckpoint())
    val states = events.select(col("event_type").as("state"))
      .distinct().localCheckpoint()
    val k = states.count()
    var pi = states.select(col("state"), lit(1.0 / k).as("pi"))
    for (_ <- 1 to iters) {
      val flow = pi.join(p, pi("state") === p("from_type"))
        .groupBy(col("to_type").as("state"))
        .agg(sum(col("pi") * col("p")).as("flow"))
      val fs = flow.agg(sum("flow").as("fs"))
      pi = states.join(flow, Seq("state"), "left")
        .crossJoin(broadcast(fs))
        .select(col("state"),
          (coalesce(col("flow"), lit(0.0)) +
            (lit(1.0) - col("fs")) / lit(k.toDouble)).as("pi"))
        .localCheckpoint()
    }
    (p, pi, k)
  }

  def markovStationary(events: DataFrame, iters: Int = 8): DataFrame = {
    val (_, pi, _) = markovChain(events, iters)
    pi.select(col("state"), round(col("pi"), 6).as("pi")).orderBy("state")
  }

  /** Entropy rate of the behavioral Markov chain (Shannon 1948 §7 —
    * H = −Σᵢ πᵢ Σⱼ pᵢⱼ ln pᵢⱼ): how predictable the NEXT event type
    * is given the current one, stationary-weighted — the sequence-
    * predictability scalar [[markovStationary]]'s vector and
    * [[eventTransitions]]'s matrix both feed into. h_ratio = H/ln k
    * is the dimension-free reading (1 = i.i.d.-uniform sequences, →
    * 0 = deterministic flows). Conditional entropies and π come off
    * the shared chain build; everything after is |types|-row algebra.
    * Returns one row (n_states, h_rate, h_max, h_ratio). */
  def entropyRate(events: DataFrame, iters: Int = 8): DataFrame = {
    val (p, pi, k) = markovChain(events, iters)
    val h = p.groupBy(col("from_type").as("state"))
      .agg(sum(-col("p") * log(col("p"))).as("hc"))
    pi.join(broadcast(h), Seq("state"), "left")
      .agg(sum(col("pi") * coalesce(col("hc"), lit(0.0))).as("hr"))
      .select(lit(k).as("n_states"),
        round(col("hr"), 6).as("h_rate"),
        round(log(lit(k.toDouble)), 6).as("h_max"),
        round(when(lit(k) > 1L, col("hr") / log(lit(k.toDouble))), 6)
          .as("h_ratio"))
  }

  /** Daily event-type pivot: one row per epoch-day, one BIGINT count
    * column per (pinned) event type — the wide activity matrix BI
    * tools and anomaly baselines consume. The type list is an explicit
    * argument: Spark's two-arg `pivot` skips the extra
    * distinct-values job and keeps the output schema static, which is
    * what a production pipeline wants anyway (a surprise event type
    * should fail loudly downstream, not silently add a column).
    *
    * Scale: pivot with pinned values compiles to ONE groupBy(day) with
    * |types| conditional counts — a single map-side-combined shuffle,
    * no per-type pass. Day buckets are integer epoch-days, matching
    * [[retention]]'s engine-stable arithmetic. */
  def eventTypePivot(events: DataFrame,
                     types: Seq[String] = Seq("click", "error", "purchase",
                       "signup", "view")): DataFrame = {
    require(types.nonEmpty, "eventTypePivot needs at least one type")
    events.select(
        floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("day"),
        col("event_type"))
      .groupBy("day").pivot("event_type", types).agg(count(lit(1)))
      .na.fill(0L, types)
  }

  def propsMetric(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("cnt"), round(avg(col("k")), 6).as("avg_k"))

  // ---- batch equivalents (DuckDB-oracle-able; same logical plans) ----

  /** Batch twin of windowedCounts for the oracle. Window starts are
    * emitted as formatted strings: identical content in both engines
    * without depending on the comparer's timestamp-precision handling. */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    windowAgg(events, None, streaming = false)

  /** Batch twin of [[slidingCounts]]. */
  def slidingCountsBatch(events: DataFrame): DataFrame =
    windowAgg(events, Some("30 minutes"), streaming = false)

  /** Batch twin of burstDedup with a deterministic representative per
    * burst (smallest (ts, event_id)) — the streaming form keeps the
    * first *arrival* instead, so the spec asserts burst-key parity and
    * the oracle checks this deterministic variant in full. */
  def burstDedupBatch(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("bucket"),
        col("event_id"))
  }

  /** Batch sessionization via window functions — identical session
    * boundaries to the stateful streaming version on complete input. */
  def sessionsBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          col("ts") > col("prev") + expr(s"INTERVAL $gapMinutes MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("new_sess").over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).cast("long").as("n_events"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"))
  }

  /** Session bounce profile per entry event type: sessions (the
    * sessionStats 30-min-gap split) grouped by their FIRST event's
    * type, with the single-event ("bounce") share — the landing-
    * quality read of web analytics. Exact (us, event_id)-ordered
    * first pick via min-struct; per-user windows only; output bounded
    * by the event-type domain. */
  def bounceRate(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    require(gapMinutes > 0, s"gapMinutes must be positive, got $gapMinutes")
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val marked = events
      .select(col("user_id"), ntzMicros.as("us"), col("event_id"),
        col("event_type"))
      .withColumn("prev", lag("us", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sess = marked.groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_ev"),
        min(struct(col("us"), col("event_id"), col("event_type")))
          .as("f"))
    sess.groupBy(col("f.event_type").as("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1L, 1L).otherwise(0L)).as("n_bounces"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounces"),
        round(col("n_bounces").cast("double") /
          col("n_sessions").cast("double"), 6).as("bounce_rate"))
      .orderBy("entry_type")
  }

  /** Daily new-vs-returning split: per day, distinct active users,
    * those whose FIRST-EVER event lands that day (new), and the
    * remainder (returning) — the simplest growth-accounting read.
    * One min-day pass per user + one distinct-actives pass; exact
    * counts. */
  def newReturning(events: DataFrame): DataFrame = {
    val days = events.select(
      floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long").as("day"),
      col("user_id"))
    val first = days.groupBy("user_id").agg(min("day").as("d0"))
    days.distinct()
      .join(first, Seq("user_id"))
      .groupBy("day")
      .agg(count(lit(1)).as("active_users"),
        sum(when(col("d0") === col("day"), 1L).otherwise(0L))
          .as("new_users"))
      .select(col("day"), col("active_users"), col("new_users"),
        (col("active_users") - col("new_users")).as("returning"))
      .orderBy("day")
  }
}
