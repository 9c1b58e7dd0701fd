package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.graph.GraphBuilder
import graft.streaming.EventStreams

/** Structured Streaming semantics against the batch twins (streams are
  * not DuckDB-oracle-able; batch equivalents are — q_events_window /
  * q_events_sessions). Uses the file source with Trigger.AvailableNow and
  * memory sinks: public APIs only, deterministic. */
class StreamingSpec extends SparkSpec {

  private def events = EventStreams.eventsTable(spark, sfDir)

  test("incremental filter stream delivers the same rows as batch") {
    val q = EventStreams.highValue(EventStreams.readEvents(spark, sfDir), 15.0)
      .writeStream.format("memory").queryName("hv")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("hv").count()
    val batch = EventStreams.highValue(events, 15.0).count()
    assert(streamed == batch && streamed > 0)
  }

  test("windowed aggregation matches the batch twin (complete mode)") {
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, sfDir))
      .writeStream.format("memory").queryName("wc").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("wc")
      .select(col("wstart"), col("event_type"), col("cnt"))
    val batch = EventStreams.windowedCountsBatch(events)
      .select(col("wstart").cast("timestamp").as("wstart"), col("event_type"), col("cnt"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() > 0)
  }

  test("sliding-window aggregation matches the batch twin (complete mode)") {
    val q = EventStreams.slidingCounts(EventStreams.readEvents(spark, sfDir))
      .writeStream.format("memory").queryName("sc").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sc")
      .select(col("wstart"), col("event_type"), col("cnt"))
    val batch = EventStreams.slidingCountsBatch(events)
      .select(col("wstart").cast("timestamp").as("wstart"), col("event_type"), col("cnt"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // every event lands in exactly 2 windows: sliding total = 2x tumbling
    val slideSum = spark.table("sc").agg(sum("cnt")).head.getLong(0)
    val tumbleSum = EventStreams.windowedCountsBatch(events)
      .agg(sum("cnt")).head.getLong(0)
    assert(slideSum == 2 * tumbleSum)
  }

  test("streaming burst dedup keeps exactly one event per burst key") {
    val q = EventStreams.burstDedup(EventStreams.readEvents(spark, sfDir))
      .writeStream.format("memory").queryName("bd").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("bd")
      .select(col("user_id"), col("event_type"),
        date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket"))
    val batch = EventStreams.burstDedupBatch(events)
      .select("user_id", "event_type", "bucket")
    // identical burst-key sets (the representative event may differ:
    // streaming keeps first arrival, batch the smallest (ts, event_id))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() > 0 && streamed.count() < events.count())
  }

  test("streaming per-window sketch: MGBuf state survives micro-batch boundaries") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.pipeline.Sketches.windowHeavyHittersStream(
        ms.toDF().toDF("ts", "event_type"), k = 16)
      .writeStream.format("memory").queryName("whh").outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // window A (10:00) and window B (11:00) split across two
      // micro-batches — the second batch MERGES into the MGBuf state the
      // store deserialized from the first, the exact path a long-running
      // stream exercises
      ms.addData((t("2020-01-01 10:05:00"), "a"), (t("2020-01-01 10:10:00"), "a"),
        (t("2020-01-01 10:15:00"), "b"), (t("2020-01-01 11:05:00"), "c"))
      q.processAllAvailable()
      ms.addData((t("2020-01-01 10:20:00"), "a"), (t("2020-01-01 10:25:00"), "b"),
        (t("2020-01-01 10:40:00"), "b"), (t("2020-01-01 11:30:00"), "c"),
        (t("2020-01-01 11:45:00"), "c"))
      q.processAllAvailable()
      val got = spark.table("whh").collect()
        .map(r => r.getTimestamp(0).toString -> r.getAs[Map[String, Long]](1)).toMap
      // k ≥ vocab → the sketch is exact: true counts across BOTH batches
      assert(got == Map(
        "2020-01-01 10:00:00.0" -> Map("a" -> 3L, "b" -> 3L),
        "2020-01-01 11:00:00.0" -> Map("c" -> 3L)))
    } finally q.stop()
  }

  test("streaming per-window KMV: distinct counts survive micro-batch boundaries") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.pipeline.Sketches.windowDistinctStream(
        ms.toDF().toDF("ts", "event_type"), k = 16)
      .writeStream.format("memory").queryName("wkmv").outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // window A's distinct set is split across two micro-batches with a
      // repeat ("a" arrives in both) — the second batch merges into the
      // KMVBuf the state store deserialized from the first, and the
      // repeat must not inflate the count
      ms.addData((t("2020-01-01 10:05:00"), "a"), (t("2020-01-01 10:10:00"), "b"),
        (t("2020-01-01 11:05:00"), "c"))
      q.processAllAvailable()
      ms.addData((t("2020-01-01 10:20:00"), "a"), (t("2020-01-01 10:25:00"), "c"),
        (t("2020-01-01 11:30:00"), "c"))
      q.processAllAvailable()
      val got = spark.table("wkmv").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(got == Map(
        "2020-01-01 10:00:00.0" -> 3L, // a, b, c
        "2020-01-01 11:00:00.0" -> 1L)) // c
      // batch twin over the same rows agrees (stream ≡ batch)
      val batch = graft.pipeline.Sketches.windowDistinct(
        Seq((t("2020-01-01 10:05:00"), "a"), (t("2020-01-01 10:10:00"), "b"),
          (t("2020-01-01 11:05:00"), "c"), (t("2020-01-01 10:20:00"), "a"),
          (t("2020-01-01 10:25:00"), "c"), (t("2020-01-01 11:30:00"), "c"))
          .toDF("ts", "event_type"), k = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(batch == Map("2020-01-01 10:00:00" -> 3L, "2020-01-01 11:00:00" -> 1L))
    } finally q.stop()
  }

  test("streaming per-window count-min: CMBuf state survives micro-batch boundaries") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String)]
    val q = graft.pipeline.Sketches.windowCmsStream(
        ms.toDF().toDF("ts", "event_type"), d = 3, w = 256)
      .writeStream.format("memory").queryName("wcms").outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (t("2020-01-01 10:05:00"), "a"), (t("2020-01-01 10:10:00"), "a"),
      (t("2020-01-01 10:15:00"), "b"), (t("2020-01-01 11:05:00"), "c"),
      (t("2020-01-01 10:20:00"), "a"), (t("2020-01-01 11:30:00"), "c"))
    try {
      // window 10:00's counts split across two micro-batches: the second
      // batch element-wise-adds into the CMBuf the store round-tripped
      ms.addData(rows.take(4): _*)
      q.processAllAvailable()
      ms.addData(rows.drop(4): _*)
      q.processAllAvailable()
      // probe the emitted sketch rows downstream of the sink
      val got = spark.table("wcms")
        .select(col("wstart"),
          graft.pipeline.Sketches.cmsEstimate(col("sk"), lit("a"), 3, 256)
            .as("ea"),
          graft.pipeline.Sketches.cmsEstimate(col("sk"), lit("c"), 3, 256)
            .as("ec"))
        .collect().map(r => r.getTimestamp(0).toString -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got("2020-01-01 10:00:00.0") == ((3L, 0L)))
      assert(got("2020-01-01 11:00:00.0") == ((0L, 2L)))
      // order-independent: the batch form over the same rows (any
      // order) emits identical estimates — stream ≡ batch in EVERY
      // regime, like KMV
      val batch = graft.pipeline.Sketches.windowCms(
          spark.sparkContext.parallelize(rows.reverse, 7)
            .toDF("ts", "event_type"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(batch(("2020-01-01 10:00:00", "a")) == 3L)
      assert(batch(("2020-01-01 11:00:00", "c")) == 2L)
    } finally q.stop()
  }

  test("streaming per-window hll: HLLBuf state survives micro-batch boundaries") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Long)]
    val q = graft.pipeline.Sketches.windowHllStream(
        ms.toDF().toDF("ts", "user_id"), p = 8)
      .writeStream.format("memory").queryName("whll").outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // window 10:00 sees users 1..40 split across two micro-batches
    // (1..25 then 20..40, overlapping — the register max absorbs the
    // replay); window 11:00 sees 1..10
    val b1 = (1L to 25L).map(u => (t("2020-01-01 10:05:00"), u))
    val b2 = (20L to 40L).map(u => (t("2020-01-01 10:35:00"), u)) ++
      (1L to 10L).map(u => (t("2020-01-01 11:05:00"), u))
    try {
      ms.addData(b1: _*)
      q.processAllAvailable()
      ms.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("whll")
        .select(col("wstart"),
          graft.pipeline.Sketches.hllEstimate(col("sk"), 8).as("est"))
        .collect().map(r => r.getTimestamp(0).toString -> r.getDouble(1))
        .toMap
      // linear-counting regime at these cardinalities (true 40 and 10);
      // hash60 is deterministic so the collision pattern — and hence
      // the estimate — is a fixed number, pinned exactly
      assert(got("2020-01-01 10:00:00.0") == 36.48, got.toString)
      assert(got("2020-01-01 11:00:00.0") == 10.2006, got.toString)
      // stream ≡ batch: the batch agg over the same rows (any order,
      // any partitioning) emits the identical register row → identical
      // estimate — register max is order-independent in every regime
      val hll = org.apache.spark.sql.functions.udaf(new graft.pipeline.HLL(8),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Int]())
      val batch = spark.sparkContext.parallelize((b1 ++ b2).reverse, 9)
        .toDF("ts", "user_id")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(hll(graft.pipeline.Sketches.hllSlot(
          col("user_id").cast("string"), 8, "hllu:")).as("sk"))
        .select(col("window.start").as("wstart"),
          graft.pipeline.Sketches.hllEstimate(col("sk"), 8).as("est"))
        .collect().map(r => r.getTimestamp(0).toString -> r.getDouble(1))
        .toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming per-window quantiles: SHBuf state survives micro-batch boundaries") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, Double)]
    val q = graft.pipeline.Sketches.windowQuantilesStream(
        ms.toDF().toDF("ts", "value"), k = 16)
      .writeStream.format("memory").queryName("wsh").outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // one window's values split across two micro-batches; the second
      // merges into the SHBuf the state store round-tripped
      ms.addData((t("2020-01-01 10:05:00"), 10.0), (t("2020-01-01 10:10:00"), 30.0))
      q.processAllAvailable()
      ms.addData((t("2020-01-01 10:20:00"), 20.0), (t("2020-01-01 10:25:00"), 40.0),
        (t("2020-01-01 10:40:00"), 50.0))
      q.processAllAvailable()
      val got = spark.table("wsh").collect()
        .map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getDouble(2))).toList
      // N=5: p50 target ceil(2.5)=3 → 30; p95 target ceil(4.75)=5 → 50
      assert(got == List(("2020-01-01 10:00:00.0", 30.0, 50.0)))
    } finally q.stop()
  }

  test("interArrival: gaps by event time with event_id tiebreak") {
    val implicits = spark.implicits
    import implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, t("2020-01-01 10:00:00")),
      (2L, 1L, t("2020-01-01 10:00:30")),
      (3L, 1L, t("2020-01-01 10:02:30")),
      (4L, 2L, t("2020-01-01 09:00:00"))) // single event: null gaps
      .toDF("event_id", "user_id", "ts")
    val got = EventStreams.interArrival(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toList
    // user 1: gaps 30 s and 120 s → avg 75, max 120; user 2: no gap
    assert(got == List((1L, 3L, 75.0, 120L), (2L, 1L, null, null)))
  }

  test("funnel: converted starts counted once, window boundary inclusive") {
    val implicits = spark.implicits
    import implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, "signup", t("2020-01-01 10:00:00")),
      (2L, 1L, "purchase", t("2020-01-02 10:00:00")), // converts start 1
      (3L, 1L, "purchase", t("2020-01-03 10:00:00")), // second hit: still 1 conversion
      (4L, 2L, "signup", t("2020-01-01 10:00:00")),
      (5L, 2L, "purchase", t("2020-01-08 10:00:00")), // exactly +168 h, inclusive
      (6L, 3L, "signup", t("2020-01-01 10:00:00")),
      (7L, 3L, "purchase", t("2020-01-10 10:00:00")) // outside the window
    ).toDF("event_id", "user_id", "event_type", "ts")
    val r = EventStreams.funnel(ev).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((3L, 2L, 0.666667)))
    // degenerate windows fail fast with a funnel-level message, not
    // RangeJoin's internal bucketSeconds requirement
    val e = intercept[IllegalArgumentException] {
      EventStreams.funnel(ev, withinHours = 0)
    }
    assert(e.getMessage.contains("funnel conversion window"))
  }

  test("streaming per-window top-k: TopKBuf state survives micro-batch boundaries") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val q = graft.pipeline.Sketches.windowTopStream(
        ms.toDF().toDF("event_id", "ts", "value"), k = 2)
      .writeStream.format("memory").queryName("wtop").outputMode("complete").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // the window's eventual top-2 is split across batches: the second
      // batch's 9.0 must displace the buffered 5.0
      ms.addData((1L, t("2020-01-01 10:05:00"), 5.0),
        (2L, t("2020-01-01 10:10:00"), 7.0))
      q.processAllAvailable()
      ms.addData((3L, t("2020-01-01 10:20:00"), 9.0),
        (4L, t("2020-01-01 10:25:00"), 1.0))
      q.processAllAvailable()
      val got = spark.table("wtop").collect()
        .map(r => r.getTimestamp(0).toString ->
          r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getDouble(0), e.getLong(1))))
        .toMap
      assert(got == Map("2020-01-01 10:00:00.0" -> Seq((9.0, 3L), (7.0, 2L))))
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)]
    val signups = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = EventStreams.intervalJoinStream(
        clicks.toDF().toDF("click_id", "user_id", "ts"),
        signups.toDF().toDF("s_user_id", "sts", "signup_id"))
      .writeStream.format("memory").queryName("ivj").outputMode("append").start()
    try {
      // signup arrives first; matching click lands in a LATER batch —
      // the join must find it in buffered state
      signups.addData((1L, t("2020-01-01 10:00:00"), 100L))
      clicks.addData((1L, 2L, t("2020-01-01 10:30:00"))) // other user: no match
      q.processAllAvailable()
      clicks.addData(
        (2L, 1L, t("2020-01-01 10:30:00")),  // inside [10:00, 11:00]
        (3L, 1L, t("2020-01-01 11:00:00")),  // boundary, inclusive
        (4L, 1L, t("2020-01-01 11:30:00")))  // outside
      q.processAllAvailable()
      val streamed = spark.table("ivj")
        .select("click_id", "signup_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toList
      assert(streamed == List((2L, 100L), (3L, 100L)))
      // batch twin over the same rows agrees
      val bc = Seq((1L, 2L, t("2020-01-01 10:30:00")),
        (2L, 1L, t("2020-01-01 10:30:00")), (3L, 1L, t("2020-01-01 11:00:00")),
        (4L, 1L, t("2020-01-01 11:30:00"))).toDF("click_id", "user_id", "ts")
      val bs = Seq((1L, t("2020-01-01 10:00:00"),
          t("2020-01-01 11:00:00"), 100L)).toDF("s_user_id", "sstart", "send", "signup_id")
        .withColumnRenamed("s_user_id", "user_id")
      val batch = graft.ops.RangeJoin
        .pointInInterval(bc, bs, Seq("user_id"), "ts", "sstart", "send")
        .select("click_id", "signup_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toList
      assert(batch == streamed)
    } finally q.stop()
  }

  test("left-outer interval join: organic clicks emit null AFTER the horizon") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val clicks = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, java.sql.Timestamp)]
    val signups = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Long)]
    val q = EventStreams.intervalJoinOuterStream(
        clicks.toDF().toDF("click_id", "user_id", "ts"),
        signups.toDF().toDF("s_user_id", "sts", "signup_id"))
      .writeStream.format("memory").queryName("ivjo").outputMode("append").start()
    try {
      signups.addData((1L, t("2020-01-01 10:00:00"), 100L))
      clicks.addData(
        (2L, 1L, t("2020-01-01 10:30:00")),  // attributed
        (5L, 9L, t("2020-01-01 10:45:00")))  // organic: no signup ever
      q.processAllAvailable()
      val early = spark.table("ivjo").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toMap
      // matched row emits promptly; the organic click must NOT be
      // declared unmatched yet — a matching signup could still arrive
      assert(early == Map(2L -> 100L), early.toString)
      // advance both watermarks far past the click's join horizon —
      // eviction time IS null-emit time
      clicks.addData((99L, 50L, t("2020-01-02 12:00:00")))
      signups.addData((60L, t("2020-01-02 12:00:00"), 999L))
      q.processAllAvailable()
      // one more cycle so the no-data batch after watermark advance fires
      clicks.addData((98L, 51L, t("2020-01-02 12:00:01")))
      q.processAllAvailable()
      val late = spark.table("ivjo").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toMap
      assert(late.get(5L).contains(-1L),
        s"organic click must emit with NULL signup after the horizon: $late")
      assert(late(2L) == 100L)
    } finally q.stop()
  }

  test("stateful transition steps: stream counts ≡ batch transition matrix") {
    val sparkS = spark
    import sparkS.implicits._
    val evs = EventStreams.readEvents(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.transitionSteps(evs)
      .writeStream.format("memory").queryName("steps").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("steps")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val batch = EventStreams.eventTransitions(events)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("online CUSUM stream ≡ batch twin on completed hours") {
    val sparkS = spark
    import sparkS.implicits._
    val evs = EventStreams.readEvents(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.cusumOnlineSteps(evs)
      .writeStream.format("memory").queryName("cus").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("cus").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    // batch rows minus each type's final (still-open) hour
    val batchAll = EventStreams.cusumOnlineBatch(events).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    val lastHr = batchAll.keys.groupBy(_._1).map { case (t, ks) =>
      t -> ks.map(_._2).max }
    val batchClosed = batchAll.filter { case ((t, hr), _) => hr < lastHr(t) }
    assert(streamed.nonEmpty && streamed == batchClosed)
  }

  test("online Pettitt stream ≡ batch twin on closed-day prefixes") {
    val sparkS = spark
    import sparkS.implicits._
    val evs = EventStreams.readEvents(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = graft.streaming.Trend.pettittOnlineSteps(evs)
      .writeStream.format("memory").queryName("pet").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("pet").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(streamed.nonEmpty)
    // every close emits the batch pettitt decision over that prefix —
    // check the first, a middle, and the last closed day
    val keys = streamed.keys.toSeq.sorted
    for (d <- Seq(keys.head, keys(keys.size / 2), keys.last)) {
      val pre = events.filter(
        floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long") <= d)
      val b = graft.streaming.Trend.pettitt(pre).collect()(0)
      assert(streamed(d) == ((b.getLong(0), b.getLong(1), b.getLong(2),
        b.getLong(3), b.getDouble(4))), s"prefix through day $d")
    }
    // one emission per OBSERVED closed day (the 1-day prefix emits
    // nothing — batch has no row on a single-day grid either)
    assert(keys.size >= 3 && keys.distinct.size == keys.size)
  }

  test("online Page-Hinkley stream ≡ batch twin on closed-day prefixes") {
    val sparkS = spark
    import sparkS.implicits._
    val evs = EventStreams.readEvents(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = graft.streaming.Trend.pageHinkleyOnlineSteps(evs)
      .writeStream.format("memory").queryName("phq").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("phq").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(streamed.nonEmpty)
    // every close emits the batch decision for that day over the
    // closed prefix — check the first, a middle, and the last close
    val keys = streamed.keys.toSeq.sorted
    for (d <- Seq(keys.head, keys(keys.size / 2), keys.last)) {
      val pre = events.filter(
        floor(unix_timestamp(col("ts")) / lit(86400L)).cast("long") <= d)
      val b = graft.streaming.Trend.pageHinkley(pre).collect().last
      assert(b.getLong(0) == d)
      assert(streamed(d) == ((b.getLong(1), b.getDouble(2), b.getDouble(3),
        b.getBoolean(4), b.getBoolean(5))), s"prefix through day $d")
    }
    assert(keys.size >= 3 && keys.distinct.size == keys.size)
  }

  test("stateful path steps: stream trigram counts ≡ batch eventPaths") {
    val sparkS = spark
    import sparkS.implicits._
    val evs = EventStreams.readEvents(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.pathSteps(evs)
      .writeStream.format("memory").queryName("paths").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("paths")
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    val batch = EventStreams.eventPaths(events, k = 1000000).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stateful sessionization emits closed sessions matching batch") {
    val sparkS = spark
    import sparkS.implicits._
    val evs = EventStreams.readEvents(spark, sfDir)
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val q = EventStreams.sessionize(evs)
      .writeStream.format("memory").queryName("sess").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("sess")
    val batch = EventStreams.sessionsBatch(
      events.select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value")))
    val users = events.select("user_id").distinct().count()
    // each user's final session stays open in state → not emitted
    assert(streamed.count() == batch.count() - users)
    // every emitted session exists in the batch result with identical bounds
    val joined = streamed.join(batch,
      streamed("user_id") === batch("user_id") &&
      streamed("session_start") === batch("session_start") &&
      streamed("session_end") === batch("session_end") &&
      streamed("n_events") === batch("n_events"))
    assert(joined.count() == streamed.count())
  }
}
