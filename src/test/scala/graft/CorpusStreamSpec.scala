package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.CorpusStreams

/** Streaming corpus intake semantics: quality/lang gate as a narrow
  * projection, exact-dup guard across micro-batches, stream ≡ batch
  * twin on ordered arrivals. */
class CorpusStreamSpec extends SparkSpec {

  private val goodText = "the cat is on the mat and a dog is here"

  private def mkDocs(rows: (Long, String, String)*) = {
    val implicits = spark.implicits
    import implicits._
    rows.toSeq.toDF("doc_id", "text", "lang")
      .withColumn("ingest_ts", timestamp_micros(lit(1000000L)))
  }

  test("quality gate keeps lang-matched quality docs only") {
    val d = mkDocs(
      (1L, goodText, "en"),
      (2L, goodText, "de"), // guess=en ≠ labeled de
      (3L, "x", "en"))      // quality 0.304 < 0.5
    val kept = CorpusStreams.cleanBatch(d, 0.5).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("streaming clean dedups across micro-batches, first arrival wins") {
    val implicits = spark.implicits
    import implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val docs = ms.toDF().toDF("doc_id", "text", "lang")
      .withColumn("ingest_ts", timestamp_micros(lit(1000000L)))
    val q = CorpusStreams.cleanStream(docs, 0.5, "1 hour")
      .writeStream.format("memory").queryName("corpus_clean_stream").start()
    try {
      ms.addData((1L, goodText, "en"), (3L, "x", "en"))
      q.processAllAvailable()
      ms.addData((2L, goodText, "en")) // exact dup of doc 1, later batch
      q.processAllAvailable()
      val streamed = spark.table("corpus_clean_stream").collect()
        .map(_.getLong(0)).toSet
      assert(streamed == Set(1L)) // dup dropped, low-quality dropped
      // batch twin on the full input agrees (min doc_id keep)
      val batch = CorpusStreams.cleanBatch(
        mkDocs((1L, goodText, "en"), (3L, "x", "en"), (2L, goodText, "en")), 0.5)
        .collect().map(_.getLong(0)).toSet
      assert(batch == streamed)
    } finally q.stop()
  }

  test("segment gate strips mined boilerplate identically on stream and batch") {
    val implicits = spark.implicits
    import implicits._
    // Mine the boilerplate OFFLINE with the batch operator: "one two
    // three" occurs in both corpus docs at width 3 → df 2 → mined.
    val corpus = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three seven eight nine")).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val mined = graft.pipeline.TextOps.hash60(lit("one two three"), "sg:")
    val bp = corpus.select(mined.as("g")).limit(1)
      .collect().map(_.getLong(0))
    val expected = Map(
      1L -> ((2L, 1L, "four five six")),
      2L -> ((2L, 1L, "seven eight nine")),
      3L -> ((1L, 1L, "ten eleven twelve")))
    val batchIn = mkDocs(
      (1L, "one two three four five six", "en"),
      (2L, "one two three seven eight nine", "en"),
      (3L, "ten eleven twelve", "en"))
    val got = CorpusStreams.segmentGate(batchIn, bp, 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text")))).toMap
    assert(got == expected)
    // same projection over a MemoryStream: stateless, so rows match 1:1
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val sq = CorpusStreams.segmentGate(
        ms.toDF().toDF("doc_id", "text", "lang"), bp, 3)
      .select("doc_id", "n_segs", "n_kept", "clean_text")
      .writeStream.format("memory").queryName("segment_gate_stream").start()
    try {
      ms.addData((1L, "one two three four five six", "en"),
        (2L, "one two three seven eight nine", "en"))
      sq.processAllAvailable()
      ms.addData((3L, "ten eleven twelve", "en"))
      sq.processAllAvailable()
      val streamed = spark.table("segment_gate_stream").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(streamed == expected)
    } finally sq.stop()
  }

  test("bloom gate flags gram-sharing docs identically on stream and batch") {
    val implicits = spark.implicits
    import implicits._
    val evalSet = Seq((100L, "the secret benchmark answer string"))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val filter = graft.pipeline.Bloom.buildFilter(evalSet, 1 << 16, 4)
    // doc 1 embeds an eval 8-gram; docs 2 and 3 share none. Bloom has
    // no false negatives, so doc 1 MUST flag; with 27 grams in 65536
    // bits the FP odds on docs 2/3 are negligible and pinned here.
    val expected = Map(1L -> true, 2L -> false, 3L -> false)
    val batchIn = mkDocs(
      (1L, "prefix secret benchmark suffix", "en"),
      (2L, "totally unrelated content here", "en"),
      (3L, "zz", "en")) // shorter than one gram: probes its whole text
    val got = CorpusStreams.bloomGate(batchIn, filter, 1 << 16, 4)
      .select("doc_id", "contaminated").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == expected)
    // exact-operator agreement: no false negatives vs the semi-join
    // (the flagged set is a superset of the exact overlap set)
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val sq = CorpusStreams.bloomGate(
        ms.toDF().toDF("doc_id", "text", "lang"), filter, 1 << 16, 4)
      .select("doc_id", "contaminated")
      .writeStream.format("memory").queryName("bloom_gate_stream").start()
    try {
      ms.addData((1L, "prefix secret benchmark suffix", "en"))
      sq.processAllAvailable()
      ms.addData((2L, "totally unrelated content here", "en"), (3L, "zz", "en"))
      sq.processAllAvailable()
      val streamed = spark.table("bloom_gate_stream").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(streamed == expected)
    } finally sq.stop()
  }

  test("segment gate DataFrame overload: join branch equals the literal branch") {
    val implicits = spark.implicits
    import implicits._
    val docsIn = mkDocs(
      (1L, "one two three four five six", "en"),
      (2L, "one two three seven eight nine", "en"),
      (3L, "one two three", "en"), // all-boilerplate → empty clean_text
      (4L, "ten eleven twelve", "en"),
      (5L, null, "en")) // zero segment rows: both branches must keep it
    // mined set as a frame, WITH a duplicate row (the join path must
    // dedupe or it would double-count segment rows)
    val one = spark.range(1).select(
      graft.pipeline.TextOps.hash60(lit("one two three"), "sg:").as("g"))
    val bpDf = one.unionAll(one)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "n_segs", "n_kept", "clean_text").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val direct = snap(CorpusStreams.segmentGate(
      docsIn, one.collect().map(_.getLong(0)), 3))
    // smallSetMax = 0 forces the join branch; 1024 takes the literal branch
    assert(snap(CorpusStreams.segmentGate(docsIn, bpDf, 3, 0)) == direct)
    assert(snap(CorpusStreams.segmentGate(docsIn, bpDf, 3, 1024)) == direct)
    assert(direct.exists(t => t._1 == 3L && t._3 == 0L && t._4 == ""))
    // the null-text doc survives BOTH branches as (0, 0, "") — the
    // join branch's exploded agg never sees it, so only the left-outer
    // reassembly keeps the doc universe identical to the projection path
    assert(direct.contains((5L, 0L, 0L, "")) && direct.size == 5)
  }

  test("dsir gate: stream scores equal the batch scorer, threshold filters") {
    val implicits = spark.implicits
    import implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma alpha beta", "en"),
      (2L, "alpha beta gamma delta", "en"),
      (10L, "alpha beta gamma", "de"),
      (11L, "omega sigma tau", "de")).toDF("doc_id", "text", "lang")
    val ratios = graft.pipeline.Corpus.dsirRatioMap(corpus, "en", 64)
    // batch scorer ground truth: dsirWeights over the same corpus —
    // the stream's array fold must land on the identical 6-dp score
    val batch = graft.pipeline.Corpus.dsirWeights(corpus, "en", 64, 10)
      .collect().map(r => r.getLong(1) -> r.getAs[Double]("logw")).toMap
    val gateAll = CorpusStreams.dsirGate(corpus, ratios, 64,
        minLogw = Double.NegativeInfinity)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("logw")).toMap
    assert(gateAll == batch, s"stream fold $gateAll vs batch sum $batch")
    // target-vocab doc outscores the disjoint-vocab doc; a threshold
    // between them keeps exactly the target-like stream
    assert(gateAll(10L) > gateAll(11L))
    val tau = (gateAll(10L) + gateAll(11L)) / 2
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val sq = CorpusStreams.dsirGate(
        ms.toDF().toDF("doc_id", "text", "lang"), ratios, 64, tau)
      .select("doc_id")
      .writeStream.format("memory").queryName("dsir_gate_stream").start()
    try {
      ms.addData((10L, "alpha beta gamma", "de"), (11L, "omega sigma tau", "de"))
      sq.processAllAvailable()
      val kept = spark.table("dsir_gate_stream").collect().map(_.getLong(0)).toSet
      assert(kept == Set(10L))
    } finally sq.stop()
  }
}
