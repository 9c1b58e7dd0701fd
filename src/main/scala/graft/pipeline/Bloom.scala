package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter partial state: the bit array as packed 64-bit words.
  * Fixed-array in-place discipline like the other sketch buffers. */
final case class BloomBuf(words: Array[Long])

/** Bloom filter (Bloom 1970) as a typed Catalyst [[Aggregator]] — the
  * bounded-state SET-MEMBERSHIP summary completing the sketch family:
  * frequencies ([[MisraGries]]/[[CountMin]]), cardinality ([[KMV]]),
  * quantiles ([[StreamHist]]), and now "have I seen this key". State is
  * m bits regardless of how many keys were added; reduce sets k bits
  * per row; merge is one element-wise OR — associative, commutative and
  * ORDER-INDEPENDENT, so the filter is a pure function of the input
  * set in every regime.
  *
  * Like [[CountMin]], the k bit positions are computed IN THE PLAN
  * (codegen'd `graft_hash60` over per-position prefixes, mod m — see
  * [[Bloom.positions]]); the aggregator consumes finished indices.
  * Because a Bloom filter's semantics reduce to "the set of set bit
  * positions", a SQL oracle can reproduce membership answers EXACTLY —
  * false positives included — by rebuilding the position set
  * relationally from the same md5 mirror formula. No "zero-FP regime"
  * caveat is needed; the estimate itself is deterministic. */
class BloomAgg(mWords: Int, k: Int)
    extends Aggregator[Seq[Int], BloomBuf, Array[Long]] {
  require(mWords >= 1 && k >= 1, "Bloom needs >= 1 word and >= 1 hash")

  override def zero: BloomBuf = BloomBuf(new Array[Long](mWords))

  override def reduce(b: BloomBuf, positions: Seq[Int]): BloomBuf = {
    var i = 0
    while (i < k) {
      val p = positions(i)
      b.words(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
    b
  }

  override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
    var i = 0
    while (i < mWords) { a.words(i) |= b.words(i); i += 1 }
    a
  }

  override def finish(s: BloomBuf): Array[Long] = s.words

  override def bufferEncoder: Encoder[BloomBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

/** Second tree level of the Bloom build: OR-merge of FINISHED filter
  * word arrays. Same element-wise OR as [[BloomAgg.merge]] — an
  * associative, commutative, order-independent reduction, so a
  * two-level (salted partial → final) tree computes bit-for-bit the
  * same filter as one global agg while spreading the merge work over
  * many tasks instead of one final reduce. */
class BloomOrAgg(mWords: Int)
    extends Aggregator[Array[Long], BloomBuf, Array[Long]] {
  require(mWords >= 1, "Bloom OR-merge needs >= 1 word")

  override def zero: BloomBuf = BloomBuf(new Array[Long](mWords))

  override def reduce(b: BloomBuf, w: Array[Long]): BloomBuf = {
    var i = 0
    while (i < mWords) { b.words(i) |= w(i); i += 1 }
    b
  }

  override def merge(a: BloomBuf, b: BloomBuf): BloomBuf = {
    var i = 0
    while (i < mWords) { a.words(i) |= b.words(i); i += 1 }
    a
  }

  override def finish(s: BloomBuf): Array[Long] = s.words

  override def bufferEncoder: Encoder[BloomBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object Bloom {

  /** The k codegen'd bit positions for `key`, as one int-array column:
    * pos_i = hash60("bl<i>:" ++ key) mod m. Mirrors in DuckDB as
    * ('0x'||substr(md5('bl<i>:'||key),1,15))::BIGINT % m. */
  def positions(key: Column, k: Int, mBits: Int): Column =
    array((0 until k).map(i =>
      pmod(TextOps.hash60(key, s"bl$i:"), lit(mBits.toLong)).cast("int")): _*)

  /** `true` iff every one of the k bits for `key` is set in `words`
    * (an Array[Long] column holding the packed filter). Pure codegen'd
    * column expression — element_at + shift — usable against a
    * broadcast one-row filter. */
  def mightContain(words: Column, key: Column, k: Int, mBits: Int): Column =
    (0 until k).map { i =>
      val pos = pmod(TextOps.hash60(key, s"bl$i:"), lit(mBits.toLong)).cast("int")
      getbit(element_at(words, shiftrightunsigned(pos, 6) + 1),
        pos.bitwiseAND(lit(63))) === 1
    }.reduce(_ && _)

  /** Bloom-gated decontamination — the broadcast-prefilter form of
    * [[Corpus.decontaminate]] a 100 TB corpus runs when the eval
    * benchmark is small: build an m-bit filter over the eval slice's
    * 8-gram keys (ONE bounded aggregation → a single row of m/64
    * longs), broadcast it, and probe every training gram with k
    * codegen'd bit tests — no shuffle of the training gram stream at
    * all, versus the exact semi-join's full gram-keyed exchange.
    * Returns (doc_id, n_maybe): per flagged training doc, how many of
    * its DISTINCT grams the filter accepts. n_maybe ≥ the exact
    * n_shared, the Bloom overcount being the documented price of the
    * shuffle-free probe; sizing m at ~10 bits/key puts the FP rate
    * under 1% and the exact pass can then run on the ≤1% survivors.
    * Same split-before-shingle discipline as the exact operator. */
  /** Build the m-bit filter over the 8-gram keys of `keyDocs` —
    * a TWO-LEVEL tree aggregation producing a single (words:
    * Array[Long]) row, the broadcast side of every downstream probe
    * (batch decontam below, or the zero-state streaming gate in
    * [[graft.streaming.CorpusStreams.bloomGate]]).
    *
    * Tree shape: each input partition still builds ONE map-side
    * partial buffer (the [[BloomAgg]] hash-agg partial), but those
    * partials now land on `fanIn` salted reducers (salt =
    * partition_id mod fanIn — already 1 row per partition, so the
    * exchange moves P word-arrays either way) which OR-merge P/fanIn
    * buffers each IN PARALLEL; the final 1-row reduce then ORs only
    * `fanIn` arrays. At 1000 executors the old single final combine
    * of P × 128 KiB states was the natural straggler (and the suite's
    * one recurring host_suspect row); the tree caps the serial merge
    * path at P/fanIn + fanIn arrays. OR is order-independent, so the
    * result is bit-identical to the one-shot agg. */
  def buildFilter(keyDocs: DataFrame, mBits: Int = 1 << 20,
                  k: Int = 4, fanIn: Int = 8): DataFrame = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    require(fanIn >= 1, "fanIn must be >= 1")
    val mWords = mBits / 64
    val bl = udaf(new BloomAgg(mWords, k), ExpressionEncoder[Seq[Int]]())
    val orM = udaf(new BloomOrAgg(mWords), ExpressionEncoder[Array[Long]]())
    TextOps.shingles(keyDocs, 8)
      .select(positions(col("sh"), k, mBits).as("ps"),
        pmod(spark_partition_id().cast("long"), lit(fanIn.toLong)).as("g"))
      .groupBy("g").agg(bl(col("ps")).as("w"))
      .agg(orM(col("w")).as("words"))
  }

  /** Bloom false-positive-rate audit: the honesty check next to the
    * filter itself. Ground truth from an exact anti-join (probe grams
    * are non-eval-doc grams NOT in the eval set, so every filter
    * accept is a false positive), measured FPR against the
    * fill-ratio estimate fill^k (the k-fold multiply, not pow — libm
    * pow differs across engines in the last ulp). bits_set counts
    * DISTINCT occupied positions exactly. One row: (n_train_grams,
    * bits_set, fill_ratio, n_probes, n_false, measured_fpr,
    * est_fpr).
    *
    * Scale: the position/bit frames are ≤ m rows; probes ride the
    * same broadcast-filter narrow map as [[bloomDecontaminate]];
    * the exact anti-join exchanges only the DISTINCT gram frame. */
  def bloomFprAudit(docs: DataFrame, evalPct: Int = 5,
                    mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val isEval =
      pmod(TextOps.hash60(col("doc_id").cast("string"), "ev:"), lit(100L)) <
        evalPct
    val evg = TextOps.shingles(docs.filter(isEval), 8)
      .select("sh").distinct().localCheckpoint()
    val nTrain = evg.agg(count(lit(1)).as("n_train_grams"))
    val bits = evg.select(explode(positions(col("sh"), k, mBits)).as("p"))
      .distinct().agg(count(lit(1)).as("bits_set"))
    val filterRow = buildFilter(docs.filter(isEval), mBits, k)
    val probes = TextOps.shingles(docs.filter(!isEval), 8)
      .select("sh").distinct()
      .join(evg, Seq("sh"), "left_anti")
    val pAgg = probes.agg(count(lit(1)).as("n_probes"))
    val falseHits = probes.crossJoin(broadcast(filterRow))
      .filter(mightContain(col("words"), col("sh"), k, mBits))
      .agg(count(lit(1)).as("n_false"))
    val fill = col("bits_set").cast("double") / lit(mBits.toDouble)
    nTrain.crossJoin(broadcast(bits)).crossJoin(broadcast(pAgg))
      .crossJoin(broadcast(falseHits))
      .select(col("n_train_grams").cast("long").as("n_train_grams"),
        col("bits_set").cast("long").as("bits_set"),
        round(fill, 6).as("fill_ratio"),
        col("n_probes").cast("long").as("n_probes"),
        col("n_false").cast("long").as("n_false"),
        round(col("n_false").cast("double") /
          col("n_probes").cast("double"), 6).as("measured_fpr"),
        round(Seq.fill(k)(fill).reduce(_ * _), 9).as("est_fpr"))
  }

  def bloomDecontaminate(docs: DataFrame, evalPct: Int = 5,
                         mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val isEval =
      pmod(TextOps.hash60(col("doc_id").cast("string"), "ev:"), lit(100L)) <
        evalPct
    val filterRow = buildFilter(docs.filter(isEval), mBits, k)
    // probe BEFORE the distinct: the filter is a narrow map against the
    // broadcast row, so only ACCEPTED grams (true hits + the ≲1% FPs)
    // ever reach a shuffle — a pre-probe distinct would exchange the
    // entire training gram stream and forfeit the filter's whole point
    TextOps.shingles(docs.filter(!isEval), 8)
      .select(col("doc_id"), col("sh"))
      .crossJoin(broadcast(filterRow))
      .filter(mightContain(col("words"), col("sh"), k, mBits))
      .select(col("doc_id"), col("sh")).distinct()
      .groupBy("doc_id").agg(count(lit(1)).cast("long").as("n_maybe"))
  }
}
