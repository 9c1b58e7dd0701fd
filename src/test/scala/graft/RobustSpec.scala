package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Robust, Similarity, TextOps}
import graft.streaming.EventStreams

/** Round-10 robust/rank wave: hand-computable fixtures for every new
  * operator (the oracle suite checks engine parity; these pin the
  * MATH on inputs small enough to verify by hand). */
class RobustSpec extends SparkSpec {

  private def docsOf(rows: Seq[(Long, String, String, Long)]) = {
    val implicits = spark.implicits
    import implicits._
    rows.toDF("doc_id", "source", "text", "n_chars")
  }

  test("quantileNorm: tie-averaged (rank-0.5)/n percent ranks per source") {
    // docs 1,2 tie exactly (same text); doc 3's quality is LOWER (its
    // stopword ratio term 0.909·0.3 loses more than the word-count
    // term gains): q3 ≈ 0.6167 < q1 = q2 = 0.624.
    val docs = docsOf(Seq(
      (1L, "a", "the cat sat on the mat", 22L),
      (2L, "a", "the cat sat on the mat", 22L), // exact tie with doc 1
      (3L, "a", "the quick brown fox jumps over the lazy dog again and again", 60L),
      (4L, "b", "one two three", 13L)))
    val got = Robust.quantileNorm(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // source a, n=3; pct = (2·cum_below + c)/(2n):
    // doc 3 (lowest): cb=0, c=1 -> 1/6; docs 1,2: cb=1, c=2 -> 4/6
    assert(got(1L) == got(2L))
    assert(got(3L) == math.rint(1.0 / 6.0 * 1e6) / 1e6)
    assert(got(1L) == math.rint(4.0 / 6.0 * 1e6) / 1e6)
    // source b, single doc: pct = 1/(2*1) = 0.5
    assert(got(4L) == 0.5)
  }

  test("neymanAllocation: budget follows N_s·sigma_s; degenerate strata get 0") {
    // a: values 10, 20 -> n=2, sd = sqrt(50); b: 15,15 -> sd 0; c: one doc
    val docs = docsOf(Seq(
      (1L, "a", "x", 10L), (2L, "a", "x", 20L),
      (3L, "b", "x", 15L), (4L, "b", "x", 15L),
      (5L, "c", "x", 99L)))
    val got = Robust.neymanAllocation(docs, total = 100L).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Long]("n_alloc") == 100L) // all weight is a's
    assert(got("b").getAs[Long]("n_alloc") == 0L)
    assert(got("c").getAs[Long]("n_alloc") == 0L)   // n<2 -> sigma 0
    assert(math.abs(got("a").getAs[Double]("sigma") - math.sqrt(50.0)) < 1e-6)
    assert(got("a").getAs[Double]("share") == 1.0)
  }

  test("madOutliers: lower medians, MAD=0 edge flags any deviation") {
    val docs = docsOf(Seq(
      (1L, "a", "x", 1L), (2L, "a", "x", 1L), (3L, "a", "x", 1L),
      (4L, "a", "x", 100L),
      // b: 1..5 -> med 3, deviations {2,1,0,1,2} -> mad 1, k=3 ->
      // outlier iff |x-3| > 3: none
      (5L, "b", "x", 1L), (6L, "b", "x", 2L), (7L, "b", "x", 3L),
      (8L, "b", "x", 4L), (9L, "b", "x", 5L)))
    val got = Robust.madOutliers(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Long]("median") == 1L)
    assert(got("a").getAs[Long]("mad") == 0L)
    assert(got("a").getAs[Long]("n_outliers") == 1L) // the 100
    assert(got("b").getAs[Long]("median") == 3L)
    assert(got("b").getAs[Long]("mad") == 1L)
    assert(got("b").getAs[Long]("n_outliers") == 0L)
  }

  test("trimmedMean: drops floor(alpha*n) from each tail exactly") {
    val docs = docsOf((1L to 10L).map(i => (i, "a", "x", i)))
    val got = Robust.trimmedMean(docs, alpha = 0.1).collect().head
    // n=10, lo=1: keep ranks 2..9 = values 2..9, mean 5.5
    assert(got.getAs[Long]("n_docs") == 10L)
    assert(got.getAs[Long]("n_kept") == 8L)
    assert(got.getAs[Double]("trimmed_mean") == 5.5)
    // alpha=0 is the plain mean
    val full = Robust.trimmedMean(docs, alpha = 0.0).collect().head
    assert(full.getAs[Long]("n_kept") == 10L)
    assert(full.getAs[Double]("trimmed_mean") == 5.5)
  }

  test("embedDispersion: mean pairwise cosine via the sum-vector identity") {
    val implicits = spark.implicits
    import implicits._
    val emb = Seq(
      // label 0: two identical unit vectors -> mean pairwise cos 1.0
      (1L, 0L, Array(1.0f, 0.0f)),
      (2L, 0L, Array(1.0f, 0.0f)),
      // label 1: opposite -> -1.0
      (3L, 1L, Array(0.0f, 2.0f)),
      (4L, 1L, Array(0.0f, -5.0f)),
      // label 2: orthogonal -> 0.0
      (5L, 2L, Array(3.0f, 0.0f)),
      (6L, 2L, Array(0.0f, 4.0f)),
      // label 3: single vector -> NULL (no pairs); zero vector excluded
      (7L, 3L, Array(1.0f, 1.0f)),
      (8L, 3L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val rows = Similarity.embedDispersion(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getAs[Double]("mean_cos") == 1.0)
    assert(rows(1L).getAs[Double]("mean_cos") == -1.0)
    assert(rows(2L).getAs[Double]("mean_cos") == 0.0)
    assert(rows(3L).getAs[Long]("n") == 1L && rows(3L).isNullAt(2))
  }

  test("codeSwitch: dominant-share gate separates mixed from monolingual") {
    val docs = docsOf(Seq(
      (1L, "a", "the cat der hund", 16L),   // en 1(the), de 1(der): mixed
      (2L, "a", "the the the is a", 16L),   // en only: not mixed
      (3L, "b", "xyzzy plugh", 11L)))       // no markers: unscored
    val got = TextOps.codeSwitch(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Long]("n_scored") == 2L)
    assert(got("a").getAs[Long]("n_mixed") == 1L)
    assert(got("a").getAs[Double]("mixed_rate") == 0.5)
    assert(got("b").getAs[Long]("n_scored") == 0L)
    assert(got("b").isNullAt(4)) // mixed_rate NULL with nothing scored
  }

  test("piiCooccur: multi-kind docs counted once, pairs tallied") {
    val docs = docsOf(Seq(
      (1L, "a", "mail a@b.co and call 555-123-4567 now", 30L), // email+phone
      (2L, "a", "just an address 10.0.0.1 here", 29L),          // ip only
      (3L, "a", "nothing sensitive", 17L)))
    val got = TextOps.piiCooccur(docs).collect().head
    assert(got.getAs[Long]("n_docs") == 3L)
    assert(got.getAs[Long]("n_any") == 2L)
    assert(got.getAs[Long]("n_multi") == 1L)
    assert(got.getAs[Long]("n_email_phone") == 1L)
    assert(got.getAs[Long]("n_email_ip") == 0L)
    assert(got.getAs[Long]("n_phone_ip") == 0L)
  }

  test("funnelLatency: first-to-first latencies, exact lower percentiles") {
    val implicits = spark.implicits
    import implicits._
    // users 1..4 convert with latencies 10,20,30,40 s; user 5 never does;
    // user 6 purchases BEFORE signing up (not a conversion)
    val rows = Seq(
      (1L, "signup", 1000L), (1L, "purchase", 1010L), (1L, "purchase", 5000L),
      (2L, "signup", 1000L), (2L, "purchase", 1020L),
      (3L, "signup", 1000L), (3L, "purchase", 1030L),
      (4L, "signup", 1000L), (4L, "purchase", 1040L),
      (5L, "signup", 1000L),
      (6L, "purchase", 900L), (6L, "signup", 1000L))
    val ev = rows.toDF("user_id", "event_type", "sec")
      .select(col("user_id"), col("event_type"),
        col("sec").cast("timestamp").as("ts"))
    val got = EventStreams.funnelLatency(ev).collect().head
    assert(got.getAs[Long]("n_users") == 6L)
    assert(got.getAs[Long]("n_converted") == 4L)
    // ceil rule: p50 = 2nd of {10,20,30,40} = 20; p90 = ceil(3.6)=4th = 40
    assert(got.getAs[Long]("p50_s") == 20L)
    assert(got.getAs[Long]("p90_s") == 40L)
    assert(got.getAs[Long]("max_s") == 40L)
    assert(got.getAs[Double]("conv_rate") ==
      math.rint(4.0 / 6.0 * 1e6) / 1e6)
  }
}
