package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

/** Streaming corpus intake — the incremental form of the cleaning
  * stages a training-data pipeline runs at ingestion time, composing
  * the batch pipeline operators with Structured Streaming: language-ID
  * agreement + quality gate as one narrow projection, then an
  * exact-duplicate guard whose seen-key state is bounded by the
  * watermark horizon (dropDuplicatesWithinWatermark), so state never
  * grows with stream length. The near-dup (minhash) pass stays a batch
  * compaction job over the accepted corpus — banding needs the full
  * signature table, and that split (cheap exact guard inline, heavy
  * near-dup in compaction) is how production pipelines run it.
  */
object CorpusStreams {

  /** Language-ID guess + quality score + threshold filter in ONE
    * narrow select — the batch corpusClean joins two projections of
    * the same table, which on a stream would be a stateful
    * stream-stream self-join for no reason: both metrics are pure
    * row functions. Keeps every input column, adds `quality`. */
  def qualityGate(docs: DataFrame, minQuality: Double): DataFrame =
    TextOps.withQuality(TextOps.withLangGuess(docs))
      .filter(col("_guess") === col("lang") && col("quality") >= minQuality)
      .drop(TextOps.langHelperCols ++ TextOps.qualityHelperCols: _*)

  /** The exact-dup key shared with Dedup.exact: first 100 chars,
    * lowercased. */
  private def fpCol = md5(lower(substring(col("text"), 1, 100)))

  /** Streaming clean: gate + exact-dup guard. `docs` must carry an
    * event-time `ingest_ts`; duplicate state is dropped past the
    * watermark. Output: (doc_id, lang, quality) of accepted docs,
    * first arrival kept per duplicate group. */
  def cleanStream(docs: DataFrame, minQuality: Double = 0.5,
                  watermark: String = "1 hour"): DataFrame =
    qualityGate(docs, minQuality)
      .withColumn("fp", fpCol)
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select("doc_id", "lang", "quality")

  /** Batch twin on complete input — identical rows when duplicates
    * arrive in doc_id order (the spec feeds them that way; the batch
    * keep is the deterministic min doc_id). */
  def cleanBatch(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    val w = Window.partitionBy("fp").orderBy("doc_id")
    qualityGate(docs, minQuality)
      .withColumn("fp", fpCol)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select("doc_id", "lang", "quality")
  }

  /** Online segment-boilerplate gate: strip every `width`-token window
    * whose 60-bit hash is in `boilerplate` (mined OFFLINE by
    * [[graft.pipeline.Corpus.segmentDedup]] / boilerplate mining over
    * the accepted corpus — document frequency is not streamable with
    * bounded state, the mined set is). A pure per-row projection — no
    * stream state at all — so it composes into any streaming intake;
    * the set rides the plan as a literal array, which is the SMALL-SET
    * fast path only (each window scans the array, and a large literal
    * bloats the plan) — a production-sized mined set goes through the
    * DataFrame overload below, which joins instead.
    * Adds (n_segs, n_kept, clean_text); works identically on batch
    * frames, which is what the spec pins. */
  def segmentGate(docs: DataFrame, boilerplate: Array[Long],
                  width: Int = 10): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.sql.Hash60.register(spark)
    val bp = typedLit(boilerplate)
    docs
      // one shared windowing definition with the offline miner — the
      // gate only strips what segmentDedup mined if both hash the
      // exact same windows. A null text (the only zero-segment case —
      // split("") still yields one empty token) coalesces to an empty
      // array, so the gate keeps the FULL doc universe with
      // (0, 0, "") — the same contract the join path below upholds.
      .withColumn("_segs",
        coalesce(graft.pipeline.Corpus.segments(split(col("text"), " "), width),
          array().cast("array<string>")))
      .withColumn("_kept", filter(col("_segs"),
        s => !array_contains(bp, call_function("graft_hash60", concat(lit("sg:"), s)))))
      .withColumn("n_segs", size(col("_segs")).cast("long"))
      .withColumn("n_kept", size(col("_kept")).cast("long"))
      .withColumn("clean_text", array_join(col("_kept"), " "))
      .drop("_segs", "_kept")
  }

  /** Online contamination gate: flag every incoming doc that shares a
    * character 8-gram with a held-out benchmark set, probing a
    * PRE-BUILT Bloom filter ([[graft.pipeline.Bloom.buildFilter]] over
    * the eval corpus, one (words) row) — the streaming form of
    * [[graft.pipeline.Bloom.bloomDecontaminate]]. The probe is a pure
    * per-row expression: `exists` over the gram POSITIONS (an int
    * sequence — the gram strings are never materialized as an array,
    * so a multi-MB doc costs 4 bytes per position, not a copy of
    * itself), each position substring-ed and bit-tested against the
    * broadcast filter row. ZERO stream state — it composes into any
    * intake like [[segmentGate]]'s literal path; the filter joins in
    * as a stream-static broadcast equi-join on a constant key (the
    * stateless stream-static shape; a bare crossJoin is rejected on
    * streams). No false negatives by Bloom construction — a flagged=
    * false doc provably shares no 8-gram with the eval set; flagged
    * docs go to the exact (batch) check or are dropped outright.
    * Works identically on batch frames; batch ≡ stream is pinned by
    * spec. Adds one boolean `contaminated`. */
  def bloomGate(docs: DataFrame, filter: DataFrame,
                mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    val probe = exists(
      sequence(lit(1), greatest(length(col("text")) - 7, lit(1))),
      i => graft.pipeline.Bloom.mightContain(
        col("_bloom_words"), col("text").substr(i, lit(8)), k, mBits))
    docs
      .withColumn("_bk", lit(1))
      .join(broadcast(filter.select(col("words").as("_bloom_words"))
        .withColumn("_bk", lit(1))), Seq("_bk"))
      .withColumn("contaminated", probe)
      .drop("_bk", "_bloom_words")
  }

  /** Online DSIR importance gate — score each arriving document with a
    * FIXED log-ratio bucket table (the model artifact
    * [[graft.pipeline.Corpus.dsirRatioMap]] mines offline) and keep it
    * iff `logw ≥ minLogw`: importance filtering at ingest, the
    * streaming half of importance resampling. The score is a pure
    * left-to-right fold over the token array against a broadcast map
    * literal — ZERO stream state, composing into any intake like
    * [[qualityGate]]. The fold order is deterministic (array order),
    * and both it and the batch scorer's unordered sum agree at the
    * shared 6-dp round — batch ≡ stream is spec-pinned against
    * `dsirWeights`. Adds `logw`; unseen buckets (possible when the
    * artifact was mined on an earlier corpus snapshot) score 0. */
  def dsirGate(docs: DataFrame, ratios: Map[Long, Double], dim: Int = 64,
               minLogw: Double = 0.0): DataFrame = {
    require(dim >= 1, "dsirGate needs dim >= 1")
    val w = typedLit(ratios)
    val toks = filter(split(col("text"), " "), t => t =!= "")
    val logw = round(aggregate(toks, lit(0.0),
      (acc, t) => acc + coalesce(element_at(w,
        pmod(TextOps.hash60(t, "ds:"), lit(dim.toLong))), lit(0.0))), 6)
    docs.withColumn("logw", logw).filter(col("logw") >= minLogw)
  }

  /** [[segmentGate]] with the mined boilerplate as a DataFrame of
    * 60-bit segment hashes (column `g`) — the production shape: the
    * mined set is itself the output of a distributed compaction job,
    * and a large one must ride a hash join on the segment hash, not a
    * plan literal (the literal is scanned O(|boilerplate|) per window
    * and bloats/breaks the plan past ~10⁴ entries).
    *
    * Sets of ≤ `smallSetMax` hashes are collected into the literal
    * fast path — identical plan to [[segmentGate]], streaming-safe
    * (zero state). Larger sets take one posexplode + a left-outer flag
    * join on the segment hash (anti-join semantics, kept outer so the
    * stripped windows still count into n_segs) + per-doc reassembly;
    * the boilerplate side broadcasts under AQE while it fits and
    * degrades to a shuffle hash join past that. Shuffle is bounded by
    * corpus tokens / width. The reassembly is an aggregation, so this
    * branch is for batch / compaction runs (a stream would need a
    * watermark on it); the output schema and values are identical to
    * the literal path (pinned by spec). */
  def segmentGate(docs: DataFrame, boilerplate: DataFrame, width: Int,
                  smallSetMax: Int): DataFrame = {
    val spark = org.apache.spark.sql.SparkSession.active
    graft.sql.Hash60.register(spark)
    // duplicates in the mined set would duplicate segment rows through
    // the join; array_contains on the literal path is naturally idempotent
    val bp = boilerplate.select(col("g").cast("long").as("g")).distinct()
    if (bp.limit(smallSetMax + 1).count() <= smallSetMax)
      segmentGate(docs, bp.collect().map(_.getLong(0)), width)
    else {
      val segs = docs
        .select(col("doc_id"),
          posexplode(graft.pipeline.Corpus.segments(split(col("text"), " "), width))
            .as(Seq("pos", "seg")))
        .withColumn("g", call_function("graft_hash60", concat(lit("sg:"), col("seg"))))
      val agg = segs
        .join(bp.withColumn("_bp", lit(true)), Seq("g"), "left_outer")
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_segs"),
          sum(col("_bp").isNull.cast("long")).cast("long").as("n_kept"),
          array_join(transform(
            array_sort(collect_list(when(col("_bp").isNull,
              struct(col("pos"), col("seg"))))),
            x => x.getField("seg")), " ").as("clean_text"))
      // left_outer + fills: a doc producing zero segment rows (null
      // text) vanishes from the exploded agg but must stay in the
      // output with (0, 0, "") — the literal-array path above is a
      // pure projection that keeps every doc, and the two paths'
      // identical-output contract is pinned by spec.
      docs.join(agg, Seq("doc_id"), "left_outer")
        .withColumn("n_segs", coalesce(col("n_segs"), lit(0L)))
        .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
        .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
    }
  }
}
