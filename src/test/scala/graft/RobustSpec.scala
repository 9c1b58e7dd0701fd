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

  test("markovStationary: 2-cycle splits evenly, dangling mass decays 3^-k") {
    val implicits = spark.implicits
    import implicits._
    // user 1 alternates A,B,A,B,A (A->B x2, B->A x2); user 2 emits a
    // single C event: C is a dangling state (no outgoing step), so each
    // iteration its mass redistributes uniformly (pi(C) shrinks by 3x:
    // the residual IS pi(C), a third of it flows back). From pi0 = 1/3:
    // after k iterations pi(C) = 3^-(k+1), pi(A) = pi(B) = (1-pi(C))/2.
    val ev = Seq(
      (1L, 1L, "A", 10L), (2L, 1L, "B", 20L), (3L, 1L, "A", 30L),
      (4L, 1L, "B", 40L), (5L, 1L, "A", 50L),
      (6L, 2L, "C", 10L))
      .toDF("event_id", "user_id", "event_type", "sec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("sec").cast("timestamp").as("ts"))
    val got = EventStreams.markovStationary(ev, iters = 8).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val c = 1.0 / math.pow(3.0, 9)
    assert(got("C") == math.rint(c * 1e6) / 1e6)
    assert(got("A") == math.rint((1.0 - c) / 2.0 * 1e6) / 1e6)
    assert(got("A") == got("B"))
  }

  private def langDocsOf(rows: Seq[(Long, String, String)]) = {
    val implicits = spark.implicits
    import implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  // quality with no punctuation: 0.4·(w/100) + 0.3 + 0.3·min(5s/w, 1)
  private val tHi = "the a is the a is the a is the" // w=10 s=10 -> 0.64
  private val tMid = "the a is cat dog bird"         // w=6 s=3   -> 0.624
  private val tLo = "cat dog bird fish"              // w=4 s=0   -> 0.316

  test("tokenBudget: theta block split, ties taken in doc_id order") {
    // en: doc1 q=.64 (10 tok), docs 2,3 tie at q=.624 (6 tok each),
    // doc4 q=.316 (4 tok). Budget 17: above-theta = doc1 (10 tok);
    // tie block remainder 7 fits doc2 (cum 6) but not doc3 (cum 12).
    // de: one 2-token doc, fully under budget -> boundary-only.
    val docs = langDocsOf(Seq(
      (1L, "en", tHi), (2L, "en", tMid), (3L, "en", tMid), (4L, "en", tLo),
      (5L, "de", "cat dog")))
    val got = pipeline.Corpus.tokenBudget(docs, budget = 17L).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = got("en")
    assert(en.getAs[Double]("theta") == 0.624)
    assert(en.getAs[Long]("n_above") == 1L)
    assert(en.getAs[Long]("tok_above") == 10L)
    assert(en.getAs[Long]("n_boundary") == 1L)
    assert(en.getAs[Long]("tok_boundary") == 6L)
    assert(en.getAs[Long]("n_selected") == 2L)
    assert(en.getAs[Long]("tokens_selected") == 16L)
    val de = got("de")
    assert(de.getAs[Long]("n_above") == 0L)
    assert(de.getAs[Long]("n_boundary") == 1L)
    assert(de.getAs[Long]("tokens_selected") == 2L)
  }

  test("qualityDupLift: value-domain deciles x candidate-pair dup flags") {
    // 4 distinct qualities: .308 ("cat dog"), .316, .624, .64 ->
    // deciles floor((2(cum-c)+c)/(2n)·10) = 1, 3, 6, 8; the candidate
    // pair (4,1) marks the lowest and highest deciles as dup.
    val implicits = spark.implicits
    import implicits._
    val docs = docsOf(Seq(
      (1L, "a", tHi, 30L), (2L, "a", tMid, 21L),
      (3L, "a", tLo, 17L), (4L, "a", "cat dog", 7L)))
    val pairs = Seq((4L, 1L)).toDF("a", "b")
    val got = pipeline.Corpus.qualityDupLift(docs, pairs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 3L, 6L, 8L))
    assert(got(1L).getAs[Long]("n_dup") == 1L)
    assert(got(8L).getAs[Long]("n_dup") == 1L)
    assert(got(3L).getAs[Long]("n_dup") == 0L)
    assert(got(6L).getAs[Long]("n_dup") == 0L)
    assert(got(1L).getAs[Double]("dup_rate") == 1.0)
    assert(got(3L).getAs[Double]("dup_rate") == 0.0)
  }

  test("vocabOverlap: distinct-term Jaccard, zero-overlap pairs absent") {
    val implicits = spark.implicits
    import implicits._
    val docs = Seq(
      (1L, "a", "x y z"), (2L, "a", "x y"), // a vocab {x,y,z}
      (3L, "b", "y z w"),                   // b vocab {y,z,w}
      (4L, "c", "q"))                       // c vocab {q} - disjoint
      .toDF("doc_id", "source", "text")
    val got = pipeline.Corpus.vocabOverlap(docs).collect()
    assert(got.length == 1) // only (a,b) overlap; c pairs drop out
    val r = got.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getAs[Long]("vocab_a") == 3L && r.getAs[Long]("vocab_b") == 3L)
    assert(r.getAs[Long]("n_both") == 2L) // {y,z}
    assert(r.getAs[Double]("jaccard") == 0.5) // 2/(3+3-2)
  }

  test("shardMix: single-source corpus has zero KL in every shard") {
    val docs = langDocsOf((1L to 40L).map(i => (i, "en", s"doc $i")))
      .withColumnRenamed("lang", "source")
    val got = pipeline.Corpus.shardMix(docs, shards = 4).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum == 40L)
    got.foreach { r =>
      assert(r.getAs[Long]("n_sources") == 1L)
      assert(r.getAs[Double]("kl") == 0.0)
    }
  }

  test("incrementalDedup: all-identical corpus gives hit_rate 1") {
    // every doc has THE same text; any incoming doc's fingerprint is in
    // the index whenever the index is non-empty (it is: 80 of 100 ids
    // land under bucket 80 in expectation, and count is asserted > 0)
    val docs = langDocsOf((1L to 100L).map(i => (i, "en", "same text")))
      .withColumnRenamed("lang", "source")
    val got = pipeline.Corpus.incrementalDedup(docs).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_incoming") > 0L)
    assert(r.getAs[Long]("n_hit") == r.getAs[Long]("n_incoming"))
    assert(r.getAs[Double]("hit_rate") == 1.0)
  }

  test("degreeAnonymity: global signature classes, per-label rollup") {
    val implicits = spark.implicits
    import implicits._
    // path 1-2-3 plus isolated 4; nodes 1,3 share the signature
    // (deg 1, neighbor-degs {2}) ACROSS labels, so neither is unique;
    // hub 2 and isolated 4 are unique in their classes.
    val nodes = Seq((1L, "L1"), (2L, "L1"), (3L, "L2"), (4L, "L2"))
      .toDF("id", "label")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = algorithms.Structure.degreeAnonymity(nodes, edges).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("L1").getAs[Long]("n_nodes") == 2L)
    assert(got("L1").getAs[Long]("n_sigs") == 2L)
    assert(got("L1").getAs[Long]("n_unique") == 1L) // node 2 only
    assert(got("L2").getAs[Long]("n_unique") == 1L) // node 4 only
    assert(got("L1").getAs[Double]("uniqueness_rate") == 0.5)
  }

  test("charsetProfile: exact class partition, punct by subtraction") {
    val docs = docsOf(Seq((1L, "a", "ab1 !é", 6L)))
    val r = TextOps.charsetProfile(docs).collect().head
    assert(r.getAs[Long]("chars") == 6L)
    val sixth = math.rint(1.0 / 6.0 * 1e6) / 1e6
    assert(r.getAs[Double]("letter_frac") == math.rint(2.0 / 6.0 * 1e6) / 1e6)
    assert(r.getAs[Double]("digit_frac") == sixth)
    assert(r.getAs[Double]("space_frac") == sixth)
    assert(r.getAs[Double]("punct_frac") == sixth)    // '!'
    assert(r.getAs[Double]("nonascii_frac") == sixth) // 'é'
  }

  test("hapaxProfile: within-source once-only terms") {
    val docs = docsOf(Seq((1L, "a", "x x y z", 7L)))
    val r = pipeline.Corpus.hapaxProfile(docs).collect().head
    assert(r.getAs[Long]("vocab") == 3L)
    assert(r.getAs[Long]("hapax") == 2L) // y, z
    assert(r.getAs[Long]("tokens") == 4L)
    assert(r.getAs[Double]("hapax_rate") == math.rint(2.0 / 3.0 * 1e6) / 1e6)
  }

  test("skipgramPairs: w=2 ordered pairs, count-desc pair-asc top") {
    val docs = docsOf(Seq((1L, "a", "a b a b", 7L)))
    val got = pipeline.Corpus.skipgramPairs(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (a,b) from 0->1 and 2->3; (a,a) 0->2; (b,a) 1->2; (b,b) 1->3
    assert(got.head == ("a", "b", 2L))
    assert(got.drop(1).toSet ==
      Set(("a", "a", 1L), ("b", "a", 1L), ("b", "b", 1L)))
  }

  test("burrowsDelta: mu cancels, exact integerized |df|/sigma mean") {
    val docs = docsOf(Seq(
      (1L, "a", "x x y", 5L), (2L, "b", "x y y y", 7L), (3L, "c", "x y", 3L)))
    def fi(c: Long, n: Long): Long =
      math.floor(1e9 * c.toDouble / n.toDouble + 0.5).toLong
    // term frequencies: x -> a 2/3, b 1/4, c 1/2; y -> a 1/3, b 3/4, c 1/2
    val fx = Map("a" -> fi(2, 3), "b" -> fi(1, 4), "c" -> fi(1, 2))
    val fy = Map("a" -> fi(1, 3), "b" -> fi(3, 4), "c" -> fi(1, 2))
    def sigma(fs: Iterable[Long]): Double = {
      val m = fs.size
      val sff = fs.map(f => BigInt(f) * BigInt(f)).sum
      val sf = fs.sum
      math.sqrt(sff.toDouble / m - (sf.toDouble / m) * (sf.toDouble / m))
    }
    val (sx, sy) = (sigma(fx.values), sigma(fy.values))
    def delta(p: String, q: String): Double = math.rint(
      ((fx(p) - fx(q)).abs.toDouble / sx + (fy(p) - fy(q)).abs.toDouble / sy)
        / 2.0 * 1e6) / 1e6
    val got = pipeline.Stats.burrowsDelta(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    got.values.foreach(r => assert(r.getAs[Long]("k_used") == 2L))
    assert(got(("a", "b")).getAs[Double]("delta") == delta("a", "b"))
    assert(got(("a", "c")).getAs[Double]("delta") == delta("a", "c"))
    assert(got(("b", "c")).getAs[Double]("delta") == delta("b", "c"))
  }

  test("triadCensus: mutual dyads, rotation-divided cycles, transitive") {
    val implicits = spark.implicits
    import implicits._
    // edges 1->2, 2->3, 3->1 (one 3-cycle), 1->3, 2->1:
    // mutual {1,2} AND {1,3} (3->1 reciprocates 1->3); transitive
    // wedges 1->2->3 (+1->3), 2->3->1 (+2->1), 2->1->3 (+2->3)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 1L))
      .toDF("src", "dst")
    val r = algorithms.Structure.triadCensus(e).collect().head
    assert(r.getAs[Long]("n_edges") == 5L)
    assert(r.getAs[Long]("mutual_dyads") == 2L)
    assert(r.getAs[Long]("cycles") == 1L)
    assert(r.getAs[Long]("transitive") == 3L)
  }

  test("lorenz: value-domain deciles, exact cumulative shares") {
    val implicits = spark.implicits
    import implicits._
    // users 1-4 one event each, user 5 six events: c=1 block -> decile
    // floor(4/10*10)=4, c=6 block -> floor(9)=9
    val ev = (Seq(1L, 2L, 3L, 4L) ++ Seq.fill(6)(5L)).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("event_id", "user_id")
    val got = EventStreams.lorenz(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(4L, 9L))
    assert(got(4L).getAs[Long]("n_users") == 4L)
    assert(got(4L).getAs[Long]("events") == 4L)
    assert(got(4L).getAs[Double]("event_share") == 0.4)
    assert(got(4L).getAs[Double]("cum_share") == 0.4)
    assert(got(9L).getAs[Long]("events") == 6L)
    assert(got(9L).getAs[Double]("cum_share") == 1.0)
  }

  test("audienceOverlap: distinct-user Jaccard, zero-overlap pairs drop") {
    val implicits = spark.implicits
    import implicits._
    val ev = Seq(("A", 1L), ("A", 2L), ("A", 2L), ("B", 2L), ("B", 3L),
      ("C", 4L)).toDF("event_type", "user_id")
    val got = EventStreams.audienceOverlap(ev).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getAs[Long]("users_a") == 2L && r.getAs[Long]("users_b") == 2L)
    assert(r.getAs[Long]("n_both") == 1L)
    assert(r.getAs[Double]("jaccard") == math.rint(1.0 / 3.0 * 1e6) / 1e6)
  }

  test("entityDensity: word-boundary caps and acronyms per 1k words") {
    val docs = docsOf(Seq((1L, "a", "The CAT Sat on NASA mat", 23L)))
    val r = TextOps.entityDensity(docs).collect().head
    assert(r.getAs[Long]("words") == 6L)
    assert(r.getAs[Long]("cap_words") == 2L) // The, Sat
    assert(r.getAs[Long]("acronyms") == 2L)  // CAT, NASA
    val d = math.rint(1000.0 * 2 / 6 * 1e6) / 1e6
    assert(r.getAs[Double]("cap_per_1k") == d)
    assert(r.getAs[Double]("acro_per_1k") == d)
  }

  test("rollingVolume: observed-day ROWS frame, explicit sum/count mean") {
    val implicits = spark.implicits
    import implicits._
    // days 0,1,3 (gap at 2) with 2,4,6 events: the ROWS frame slides
    // over OBSERVED days, so day 3's ma7 = (2+4+6)/3
    val rows = Seq.fill(2)(0L) ++ Seq.fill(4)(86400L) ++ Seq.fill(6)(259200L)
    val ev = rows.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("event_id", "sec")
      .select(col("event_id"), col("sec").cast("timestamp").as("ts"))
    val got = EventStreams.rollingVolume(ev).collect()
    assert(got.map(_.getAs[Long]("n")).toSeq == Seq(2L, 4L, 6L))
    assert(got(0).isNullAt(5)) // first delta NULL
    assert(got(2).getAs[Long]("delta") == 2L)
    assert(got(2).getAs[Double]("ma7") == 4.0)
    assert(got(2).getAs[Long]("min7") == 2L && got(2).getAs[Long]("max7") == 6L)
  }

  test("churn: next-week semi-join, last week excluded") {
    val implicits = spark.implicits
    import implicits._
    // week 0: users 1,2,3; week 1: users 2,3,4; week 2: user 4.
    // churn(0) = 1/3 (user 1), churn(1) = 2/3 (users 2,3); week 2 cut.
    val wk = 604800L
    val rows = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (2L, wk), (3L, wk), (4L, wk), (4L, 2 * wk))
    val ev = rows.zipWithIndex
      .map { case ((u, s), i) => (i.toLong, u, s) }
      .toDF("event_id", "user_id", "sec")
      .select(col("event_id"), col("user_id"),
        col("sec").cast("timestamp").as("ts"))
    val got = EventStreams.churn(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(0L, 1L))
    assert(got(0L).getAs[Long]("active") == 3L)
    assert(got(0L).getAs[Long]("retained_next") == 2L)
    assert(got(0L).getAs[Double]("churn_rate") ==
      math.rint(1.0 / 3.0 * 1e6) / 1e6)
    assert(got(1L).getAs[Long]("churned_next") == 2L)
  }

  test("psiBySource: corpus value-domain deciles, empty buckets give 0") {
    // 4 distinct n_chars values -> deciles 1,3,6,8 (the quality_dup_lift
    // rank arithmetic); source a holds the lower two, b the upper two.
    // p = 1/2 in each hit bucket, q = 1/4 -> psi = 2*(1/4)*ln(2) per
    // source
    val docs = docsOf(Seq(
      (1L, "a", "t", 10L), (2L, "a", "t", 20L),
      (3L, "b", "t", 30L), (4L, "b", "t", 40L)))
    val got = pipeline.Stats.psiBySource(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val expected = math.rint(
      2.0 * (0.5 - 0.25) * math.log(0.5 / 0.25) * 1e6) / 1e6
    assert(got("a").getAs[Long]("buckets_hit") == 2L)
    assert(got("a").getAs[Double]("psi") == expected)
    assert(got("b").getAs[Double]("psi") == expected)
  }

  test("sampleBias: zero-statistic when sampling is exactly fair") {
    val implicits = spark.implicits
    import implicits._
    // pct=100 samples EVERYTHING: o_s = n_s, e_s = n_s -> chi2 = 0
    val docs = langDocsOf(Seq((1L, "en", "x"), (2L, "en", "y"),
      (3L, "de", "z"))).withColumnRenamed("lang", "source")
    val r = pipeline.Stats.sampleBias(docs, pct = 100).collect().head
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("n_sampled") == 3L)
    assert(r.getAs[Long]("df") == 1L)
    assert(r.getAs[Double]("chi2") == 0.0)
  }

  test("dowProfile: epoch-dow shares with base-rate lift") {
    val implicits = spark.implicits
    import implicits._
    // epoch day 0 (dow 0): A,A,B; epoch day 1 (dow 1): A.
    // lift(dow0,A) = (2/3)/(3/4) = 8/9; lift(dow0,B) = (1/3)/(1/4);
    // lift(dow1,A) = 1/(3/4)
    val rows = Seq(("A", 0L), ("A", 10L), ("B", 20L), ("A", 86400L))
    val ev = rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }
      .toDF("event_id", "event_type", "sec")
      .select(col("event_id"), col("event_type"),
        col("sec").cast("timestamp").as("ts"))
    val got = EventStreams.dowProfile(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    assert(got((0L, "A")).getAs[Double]("dow_share") ==
      math.rint(2.0 / 3.0 * 1e6) / 1e6)
    assert(got((0L, "A")).getAs[Double]("lift") ==
      math.rint((2.0 / 3.0) / (3.0 / 4.0) * 1e6) / 1e6)
    assert(got((0L, "B")).getAs[Double]("lift") ==
      math.rint((1.0 / 3.0) / (1.0 / 4.0) * 1e6) / 1e6)
    assert(got((1L, "A")).getAs[Double]("lift") ==
      math.rint(1.0 / (3.0 / 4.0) * 1e6) / 1e6)
  }

  test("attribution: trailing-window touches, zero row kept") {
    val implicits = spark.implicits
    import implicits._
    // user 1: 2 clicks before its purchase; user 2: none; user 3's
    // click comes AFTER the purchase (outside the trailing window)
    val ev = Seq(
      (1L, 1L, "click", 900L), (2L, 1L, "click", 950L),
      (3L, 1L, "purchase", 1000L),
      (4L, 2L, "purchase", 2000L),
      (5L, 3L, "purchase", 100L), (6L, 3L, "click", 200L))
      .toDF("event_id", "user_id", "event_type", "sec")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("sec").cast("timestamp").as("ts"))
    val got = EventStreams.attribution(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 2L -> 1L))
  }

  test("splitLeakage: identical corpus leaks every non-train doc") {
    val docs = docsOf((1L to 200L).map(i =>
      (i, "a", "exactly the same text everywhere", 32L)))
    val got = pipeline.Corpus.splitLeakage(docs).collect()
    assert(got.nonEmpty)
    val nonTrain = got.map(_.getAs[Long]("n_docs")).sum
    assert(nonTrain > 0L && nonTrain < 200L) // train side non-empty
    got.foreach { r =>
      assert(r.getAs[Long]("n_leaked") == r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("leak_rate") == 1.0)
    }
  }

  test("percolation: exact integer thresholds fragment the path graph") {
    val implicits = spark.implicits
    import implicits._
    // path 1-2 (w=10), 2-3 (w=4), 3-4 (w=1): mean 5 -> 'avg' keeps only
    // w=10 ({1,2} + 2 singletons); '2avg' (>10) keeps nothing
    val we = Seq((1L, 2L, 10L), (2L, 3L, 4L), (3L, 4L, 1L))
      .toDF("a", "b", "w")
    val got = algorithms.Community.percolation(we).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("all").getAs[Long]("n_components") == 1L)
    assert(got("all").getAs[Double]("giant_frac") == 1.0)
    assert(got("avg").getAs[Long]("n_edges") == 1L)
    assert(got("avg").getAs[Long]("n_components") == 3L)
    assert(got("avg").getAs[Long]("giant_size") == 2L)
    assert(got("2avg").getAs[Long]("n_edges") == 0L)
    assert(got("2avg").getAs[Long]("n_components") == 4L)
    assert(got("2avg").getAs[Double]("giant_frac") == 0.25)
  }

  test("localBridges: edge with no common neighbor flagged") {
    val implicits = spark.implicits
    import implicits._
    // triangle 1-2-3 (every edge shares a neighbor) + pendant 3-4
    val pe = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val r = algorithms.Structure.localBridges(pe).collect().head
    assert(r.getAs[Long]("n_edges") == 4L)
    assert(r.getAs[Long]("n_bridges") == 1L) // (3,4)
    assert(r.getAs[Double]("bridge_rate") == 0.25)
  }

  test("blockMatrix: label-pair counts over the n_a*n_b rectangle") {
    val implicits = spark.implicits
    import implicits._
    val nodes = Seq((1L, "L1"), (2L, "L1"), (3L, "L2")).toDF("id", "label")
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 2L)).toDF("src", "dst")
    val got = algorithms.Structure.blockMatrix(nodes, edges).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got(("L1", "L2")).getAs[Long]("n_edges") == 2L)
    assert(got(("L1", "L2")).getAs[Double]("density") == 1.0) // 2/(2*1)
    assert(got(("L1", "L1")).getAs[Double]("density") == 0.25) // 1/4
  }

  test("labelAssortativity: ±1 extremes and the single-label NULL") {
    val implicits = spark.implicits
    import implicits._
    val nodes = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("id", "label")
    // all edges within label -> r = 1
    val within = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val r1 = algorithms.Structure.labelAssortativity(nodes, within)
      .collect().head
    assert(r1.getAs[Long]("n_edges") == 2L)
    assert(r1.getAs[Double]("same_share") == 1.0)
    assert(r1.getAs[Double]("assortativity") == 1.0)
    // all edges across -> r = -1 (balanced margins, expected 0.5)
    val across = Seq((1L, 3L), (3L, 1L)).toDF("src", "dst")
    val r2 = algorithms.Structure.labelAssortativity(nodes, across)
      .collect().head
    assert(r2.getAs[Double]("same_share") == 0.0)
    assert(r2.getAs[Double]("expected_same") == 0.5)
    assert(r2.getAs[Double]("assortativity") == -1.0)
    // single label -> expected_same = 1, r undefined
    val one = Seq((1L, "A"), (2L, "A")).toDF("id", "label")
    val r3 = algorithms.Structure.labelAssortativity(one,
      Seq((1L, 2L)).toDF("src", "dst")).collect().head
    assert(r3.getAs[Double]("expected_same") == 1.0)
    assert(r3.isNullAt(r3.fieldIndex("assortativity")))
  }

  test("langConfusion: off-diagonal cell with row shares") {
    val docs = langDocsOf(Seq(
      (1L, "en", "the cat"), (2L, "de", "the cat"), (3L, "de", "der hund")))
    val got = TextOps.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got(("en", "en")).getAs[Double]("row_share") == 1.0)
    assert(got(("de", "en")).getAs[Long]("n") == 1L)
    assert(got(("de", "de")).getAs[Double]("row_share") == 0.5)
  }

  test("qualityCalibration: rule gate concentrates in the top decile") {
    // three short docs fail gopher (words < 20); the 25-word doc passes
    // and carries the highest quality -> decile 8 of {1,3,6,8}
    val pass = "the quick brown fox jumps over the lazy dog and then " +
      "quickly runs toward another very large forest while singing " +
      "happy songs about winter mornings"
    val docs = docsOf(Seq(
      (1L, "a", "zz", 2L), (2L, "a", "zz zz", 5L),
      (3L, "a", "zz zz zz", 8L), (4L, "a", pass, pass.length.toLong)))
    val got = pipeline.Corpus.qualityCalibration(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 3L, 6L, 8L))
    assert(got(8L).getAs[Long]("n_keep") == 1L)
    assert(got(8L).getAs[Double]("keep_rate") == 1.0)
    Seq(1L, 3L, 6L).foreach(d => assert(got(d).getAs[Long]("n_keep") == 0L))
  }

  test("normProfile: rounded-norm lower medians per label") {
    val implicits = spark.implicits
    import implicits._
    val emb = Seq(
      (1L, Array(3.0f, 4.0f), 0), (2L, Array(6.0f, 8.0f), 0),
      (3L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.normProfile(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Long]("n_vecs") == 2L)
    assert(got(0L).getAs[Double]("mean_nrm") == 7.5)
    assert(got(0L).getAs[Double]("p50_nrm") == 5.0) // lower median
    assert(got(0L).getAs[Double]("max_nrm") == 10.0)
    assert(got(1L).getAs[Double]("p50_nrm") == 1.0)
  }

  test("hubness: identical vectors share one bucket, all cited k times") {
    val implicits = spark.implicits
    import implicits._
    val emb = (0L to 3L).map(i => (i, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.hubness(emb).collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == 3L) // each cited by the 3 others
    assert(got.head.getAs[Long]("n_vecs") == 4L)
  }

  test("knnProfile: star graph — leaves see the hub, hub sees leaves") {
    val implicits = spark.implicits
    import implicits._
    val pe = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val got = algorithms.Structure.knnProfile(pe).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L).getAs[Long]("n_nodes") == 3L)
    assert(got(1L).getAs[Double]("knn") == 3.0) // each leaf's nbr is the hub
    assert(got(3L).getAs[Long]("n_nodes") == 1L)
    assert(got(3L).getAs[Double]("knn") == 1.0) // hub's nbrs are leaves
  }

  test("quantError: half-step reconstruction error, zero vector exact") {
    val implicits = spark.implicits
    import implicits._
    // (127, 63.5): scale = 1.0, q = (127, 64) -> errs (0, 0.5)
    val emb = Seq(
      (1L, Array(127.0f, 63.5f), 0), (2L, Array(0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.quantError(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Long]("n_vecs") == 1L)
    assert(got(0L).getAs[Double]("mean_abs_err") == 0.25)
    assert(got(0L).getAs[Double]("max_abs_err") == 0.5)
    assert(got(1L).getAs[Double]("mean_abs_err") == 0.0)
    assert(got(1L).getAs[Double]("max_abs_err") == 0.0)
  }

  test("stickiness: mean over OBSERVED days of the week") {
    val implicits = spark.implicits
    import implicits._
    // week 0: day 0 has users {1,2}, day 1 has {1} -> dau_sum 3 over 2
    // observed days, wau 2 -> stickiness 3/(2*2)
    val ev = Seq((0L, 10L), (0L, 20L), (86400L, 10L))
      .toDF("sec", "user_id")
      .select(col("sec").cast("timestamp").as("ts"), col("user_id"))
    val r = EventStreams.stickiness(ev).collect().head
    assert(r.getAs[Long]("wk") == 0L)
    assert(r.getAs[Long]("n_days") == 2L)
    assert(r.getAs[Long]("wau") == 2L)
    assert(r.getAs[Double]("mean_dau") == 1.5)
    assert(r.getAs[Double]("stickiness") == 0.75)
  }

  test("behavioralEntropy: integerized per-user H, single-type user at 0") {
    val implicits = spark.implicits
    import implicits._
    val ev = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c"))
      .toDF("user_id", "event_type")
    val got = EventStreams.behavioralEntropy(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("n_users") == 1L)
    assert(got(1L).getAs[Double]("mean_entropy") == 0.0)
    // H = ln 3 - (2 ln 2)/3 = 0.63651417 -> 1e-7 units 6365142
    assert(got(2L).getAs[Double]("mean_entropy") == 0.636514)
  }

  test("purchaseIntervals: lifecycle bands over purchase-only gaps") {
    val implicits = spark.implicits
    import implicits._
    // purchases at 0h, 1h, 30h -> gaps 1 h (a_lt_6h) and 29 h (c_1d_3d);
    // the click must not break the purchase chain
    val ev = Seq(
      (1L, 0L, 7L, "purchase"), (2L, 3600L, 7L, "purchase"),
      (3L, 7200L, 7L, "click"), (4L, 108000L, 7L, "purchase"))
      .toDF("event_id", "sec", "user_id", "event_type")
      .select(col("event_id"),
        col("sec").cast("timestamp").cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"))
    val got = EventStreams.purchaseIntervals(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a_lt_6h", "c_1d_3d"))
    assert(got("a_lt_6h").getAs[Long]("n_gaps") == 1L)
    assert(got("a_lt_6h").getAs[Double]("share") == 0.5)
    assert(got("a_lt_6h").getAs[Double]("mean_gap_h") == 1.0)
    assert(got("c_1d_3d").getAs[Double]("mean_gap_h") == 29.0)
  }

  test("sessionStats: 30-min gap splits, size-band rollup") {
    val implicits = spark.implicits
    import implicits._
    // user 7: events at 0 s, 60 s (one session) and 7200 s (a new one)
    val ev = Seq((1L, 0L, 7L), (2L, 60L, 7L), (3L, 7200L, 7L))
      .toDF("event_id", "sec", "user_id")
      .select(col("event_id"),
        col("sec").cast("timestamp").cast("timestamp_ntz").as("ts"),
        col("user_id"))
    val got = EventStreams.sessionStats(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a_1", "b_2_4"))
    assert(got("a_1").getAs[Long]("n_sessions") == 1L)
    assert(got("a_1").getAs[Double]("mean_duration_min") == 0.0)
    assert(got("b_2_4").getAs[Double]("share") == 0.5)
    assert(got("b_2_4").getAs[Double]("mean_events") == 2.0)
    assert(got("b_2_4").getAs[Double]("mean_duration_min") == 1.0)
  }

  test("firstTouch: min-struct argmin vs volume share") {
    val implicits = spark.implicits
    import implicits._
    val ev = Seq(
      (1L, 0L, 1L, "click"), (2L, 10L, 1L, "purchase"),
      (3L, 0L, 2L, "view"))
      .toDF("event_id", "sec", "user_id", "event_type")
      .select(col("event_id"),
        col("sec").cast("timestamp").cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"))
    val got = EventStreams.firstTouch(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("click", "view")) // purchase never first
    assert(got("click").getAs[Long]("n_first") == 1L)
    assert(got("click").getAs[Double]("first_share") == 0.5)
    assert(got("click").getAs[Double]("event_share") == 0.333333)
    assert(got("click").getAs[Double]("lift") == 1.5) // (1*3)/(2*1)
  }

  test("typeAffinity: user-level pair lift and jaccard") {
    val implicits = spark.implicits
    import implicits._
    // u1:{a,b} u2:{a} u3:{a,b} -> n_a=3, n_b=2, n_ab=2, n_u=3
    val ev = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "a"), (3L, "b"))
      .toDF("user_id", "event_type")
    val r = EventStreams.typeAffinity(ev).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("type_a") == "a")
    assert(r.head.getAs[Long]("n_ab") == 2L)
    assert(r.head.getAs[Double]("lift") == 1.0) // 2*3/(3*2)
    assert(r.head.getAs[Double]("jaccard") == 0.666667)
  }

  test("termBurstiness: adaptation separates repeating terms") {
    val docs = docsOf(Seq(
      (1L, "s", "x x y", 5L), (2L, "s", "x z", 3L)))
    val got = pipeline.Corpus.termBurstiness(docs).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("x", "y", "z")) // cf desc, term asc
    val x = got.head
    assert(x.getAs[Long]("df") == 2L && x.getAs[Long]("cf") == 3L)
    assert(x.getAs[Long]("df2") == 1L)
    assert(x.getAs[Double]("adaptation") == 0.5)
    assert(x.getAs[Double]("rate") == 1.5)
  }

  test("charBigramEntropy: uniform two-gram lang at ln 2, norm 1") {
    val docs = langDocsOf(Seq(
      (1L, "en", "ab"), (2L, "de", "aaa"), (3L, "fr", "aba")))
    val got = TextOps.charBigramEntropy(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("en").getAs[Long]("n_grams") == 1L)
    assert(got("en").getAs[Double]("entropy") == 0.0)
    assert(got("en").isNullAt(4)) // distinct=1 -> norm NULL
    assert(got("de").getAs[Long]("n_grams") == 2L)
    assert(got("de").getAs[Double]("entropy") == 0.0) // "aa" twice
    assert(got("fr").getAs[Double]("entropy") ==
      math.rint(math.log(2) * 1e6) / 1e6)
    assert(got("fr").getAs[Double]("entropy_norm") == 1.0)
  }

  test("pcaSecond: axis-aligned data — PC2 is the minor axis") {
    val implicits = spark.implicits
    import implicits._
    // cov = diag(9, 1): PC1 = x (eig 9), deflated C' = diag(0, 1)
    val emb = Seq(
      (1L, Array(3.0f, 1.0f)), (2L, Array(-3.0f, -1.0f)),
      (3L, Array(3.0f, -1.0f)), (4L, Array(-3.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = pipeline.Pca.pcaSecond(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(math.abs(got(0L).getAs[Double]("loading")) <= 1e-6)
    assert(math.abs(got(1L).getAs[Double]("loading")) == 1.0)
    assert(got(1L).getAs[Double]("eigval") == 1.0)
    assert(got(1L).getAs[Double]("var_explained") == 1.0) // all remaining var
  }

  test("labelBalance: uniform two-class corpus") {
    val implicits = spark.implicits
    import implicits._
    val emb = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1))
      .toDF("vec_id", "label")
    val r = Similarity.labelBalance(emb).collect().head
    assert(r.getAs[Long]("n_labels") == 2L)
    assert(r.getAs[Long]("n_vecs") == 4L)
    assert(r.getAs[Double]("entropy") == math.rint(math.log(2) * 1e6) / 1e6)
    assert(r.getAs[Double]("eff_classes") == 2.0)
    assert(r.getAs[Double]("imbalance") == 1.0)
  }

  test("embedOutliers: one far vector flagged, integer compare") {
    val implicits = spark.implicits
    import implicits._
    // seven at (0,0), one at (8,0): only the far one has
    // n^2 d^2 * n > 4 * sum(n^2 d^2)
    val emb = ((1L to 7L).map(i => (i, Array(0.0f, 0.0f), 0)) :+
      (8L, Array(8.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val r = Similarity.embedOutliers(emb).collect().head
    assert(r.getAs[Long]("n_vecs") == 8L)
    assert(r.getAs[Long]("n_outliers") == 1L)
    assert(r.getAs[Double]("outlier_share") == 0.125)
    // rms = sqrt(mean dist^2) = sqrt(7) here
    assert(r.getAs[Double]("rms_dist") ==
      math.rint(math.sqrt(7.0) * 1e6) / 1e6)
  }

  test("vocabCoverage: exact integer boundary classes") {
    val docs = docsOf(Seq((1L, "s", "a a a a b b c d", 15L)))
    val got = pipeline.Corpus.vocabCoverage(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(50L).getAs[Long]("k_terms") == 1L) // 'a' alone covers 4/8
    assert(got(50L).getAs[Double]("coverage") == 0.5)
    assert(got(80L).getAs[Long]("k_terms") == 3L) // a,b + one singleton
    assert(got(80L).getAs[Double]("coverage") == 0.875)
    assert(got(90L).getAs[Long]("k_terms") == 4L)
    assert(got(95L).getAs[Double]("coverage") == 1.0)
  }

  test("hourProfile: epoch-hour mod 24 shares and lift") {
    val implicits = spark.implicits
    import implicits._
    val ev = Seq((0L, "click"), (3600L, "view"), (3660L, "click"))
      .toDF("sec", "event_type")
      .select(col("sec").cast("timestamp").as("ts"), col("event_type"))
    val got = EventStreams.hourProfile(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    assert(got((0L, "click")).getAs[Double]("hod_share") == 1.0)
    assert(got((0L, "click")).getAs[Double]("lift") == 1.5) // 1/(2/3)
    assert(got((1L, "view")).getAs[Double]("hod_share") == 0.5)
    assert(got((1L, "view")).getAs[Double]("lift") == 1.5) // .5/(1/3)
    assert(got((1L, "click")).getAs[Double]("lift") == 0.75)
  }

  test("cohortValue: rounded weekly values, age-ordered cumulative") {
    val implicits = spark.implicits
    import implicits._
    val ev = Seq(
      (1L, 0L, 7L, "signup", 0.0), (2L, 10L, 7L, "purchase", 10.5),
      (3L, 604800L, 7L, "purchase", 2.25))
      .toDF("event_id", "sec", "user_id", "event_type", "value")
      .select(col("event_id"), col("sec").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val got = EventStreams.cohortValue(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    assert(got((0L, 0L)).getAs[Long]("n_buyers") == 1L)
    assert(got((0L, 0L)).getAs[Double]("wk_value") == 10.5)
    assert(got((0L, 1L)).getAs[Double]("wk_value") == 2.25)
    assert(got((0L, 1L)).getAs[Double]("cum_value") == 12.75)
  }

  test("clusterSizes: singleton row from corpus remainder") {
    val implicits = spark.implicits
    import implicits._
    val docs = docsOf(Seq((1L, "a", "x", 1L), (2L, "a", "x", 1L),
      (3L, "b", "x", 1L), (4L, "b", "x", 1L)))
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = pipeline.Corpus.clusterSizes(docs, pairs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(3L).getAs[Long]("n_clusters") == 1L)
    assert(got(3L).getAs[Double]("doc_share") == 0.75)
    assert(got(1L).getAs[Long]("n_clusters") == 1L)
    assert(got(1L).getAs[Double]("doc_share") == 0.25)
  }

  test("dedupRetention: min-id canonical kept per source") {
    val implicits = spark.implicits
    import implicits._
    val docs = docsOf(Seq((1L, "a", "x", 1L), (2L, "a", "x", 1L),
      (3L, "b", "x", 1L), (4L, "b", "x", 1L)))
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = pipeline.Corpus.dedupRetention(docs, pairs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Long]("n_removed") == 1L) // doc 2
    assert(got("a").getAs[Double]("retention") == 0.5)
    assert(got("b").getAs[Long]("n_removed") == 1L) // doc 3
    assert(got("b").getAs[Long]("n_docs") == 2L)    // doc 4 untouched
  }

  test("ckCurve: degree-class mean local clustering, degree-1 excluded") {
    val implicits = spark.implicits
    import implicits._
    val pe = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val tri = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "tri_cnt")
    val got = algorithms.Structure.ckCurve(pe, tri).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(2L, 3L)) // node 4 (deg 1) dropped
    assert(got(2L).getAs[Long]("n_nodes") == 2L)
    assert(got(2L).getAs[Double]("mean_cc") == 1.0)
    assert(got(3L).getAs[Double]("mean_cc") == 0.333333)
  }

  test("degreeCoreRatio: peripheral pendant at ratio 1, hub diluted") {
    val implicits = spark.implicits
    import implicits._
    val pe = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val sym = pe.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pe.select(col("b").as("src"), col("a").as("dst")))
    val got = algorithms.Structure.degreeCoreRatio(sym).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("mean_core_ratio") == 1.0) // node 4: 1/1
    assert(got(2L).getAs[Double]("mean_core_ratio") == 1.0) // 2/2
    assert(got(3L).getAs[Double]("mean_core_ratio") == 0.666667) // 2/3
  }

  test("dayNRetention: exact epoch-day checkpoints, zero rows kept") {
    val implicits = spark.implicits
    import implicits._
    val ev = Seq((0L, 1L), (86400L, 1L), (0L, 2L), (0L, 3L),
      (7L * 86400L, 3L))
      .toDF("sec", "user_id")
      .select(col("sec").cast("timestamp").as("ts"), col("user_id"))
    val got = EventStreams.dayNRetention(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Long]("retained") == 1L)
    assert(got(1L).getAs[Double]("share") == 0.333333)
    assert(got(3L).getAs[Long]("retained") == 0L)
    assert(got(7L).getAs[Long]("retained") == 1L)
    assert(got(14L).getAs[Double]("share") == 0.0)
  }

  test("dimVariance: exact integer numerators, tie broken by pos") {
    val implicits = spark.implicits
    import implicits._
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.dimVariance(emb).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Double]("variance") == 0.25)
    assert(got(0L).getAs[Double]("share") == 0.5)
    assert(got(0L).getAs[Double]("cum_share") == 0.5) // pos tiebreak
    assert(got(1L).getAs[Double]("cum_share") == 1.0)
  }

  test("bloomFprAudit: exact anti-join ground truth, shared gram excluded") {
    // doc 11 hashes into the 5% eval bucket ('ev:11' % 100 = 4);
    // doc 1 shares its gram (a member -> not a probe), doc 2's gram
    // is the single true non-member probe
    val docs = docsOf(Seq(
      (11L, "s", "abcdefgh", 8L), (1L, "s", "abcdefgh", 8L),
      (2L, "s", "zzzzzzzz", 8L)))
    val r = pipeline.Bloom.bloomFprAudit(docs).collect().head
    assert(r.getAs[Long]("n_train_grams") == 1L)
    assert(r.getAs[Long]("bits_set") == 4L) // k=4 distinct positions
    assert(r.getAs[Long]("n_probes") == 1L)
    assert(r.getAs[Long]("n_false") == 0L)
    assert(r.getAs[Double]("measured_fpr") == 0.0)
  }

  test("userLifespan: span bands with density") {
    val implicits = spark.implicits
    import implicits._
    val ev = Seq((0L, 1L), (86400L, 1L), (0L, 2L), (0L, 3L),
      (30L * 86400L, 3L))
      .toDF("sec", "user_id")
      .select(col("sec").cast("timestamp").as("ts"), col("user_id"))
    val got = EventStreams.userLifespan(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("a_1d", "b_2_7d", "d_gt_28d"))
    assert(got("b_2_7d").getAs[Double]("mean_span_d") == 2.0)
    assert(got("b_2_7d").getAs[Double]("density") == 1.0)
    assert(got("d_gt_28d").getAs[Double]("mean_span_d") == 31.0)
    assert(got("d_gt_28d").getAs[Double]("density") == 0.064516) // 2/31
  }

  test("entropyRate: deterministic chain reads 0; known mixed chain matches") {
    val implicits = spark.implicits
    import implicits._
    def ev(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame =
      rows.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, i.toLong * 60L, u, t) }
        .toDF("event_id", "sec", "user_id", "event_type")
        .select(col("event_id"), col("sec").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), lit(1.0).as("value"))
    // strict alternation: every transition deterministic -> H = 0
    val det = ev(Seq.tabulate(10)(i => (1L, if (i % 2 == 0) "a" else "b")))
    val r0 = EventStreams.entropyRate(det).collect().head
    assert(r0.getLong(0) == 2L)
    assert(r0.getDouble(1) == 0.0 && r0.getDouble(3) == 0.0)
    // aperiodic chain (self-loop keeps the power iteration convergent):
    // a -> {a, b} evenly, b -> a. pi = (2/3, 1/3), H = (2/3)·ln 2
    val mix = ev(Seq((1L, "a"), (1L, "a"), (1L, "b"), (1L, "a"),
      (1L, "a"), (1L, "b"), (1L, "a")))
    val r1 = EventStreams.entropyRate(mix).collect().head
    assert(r1.getLong(0) == 2L)
    assert(math.abs(r1.getDouble(1) - 2.0 / 3.0 * math.log(2.0)) < 0.01)
    assert(math.abs(r1.getDouble(2) - math.log(2.0)) < 1e-6) // 6dp round
  }

  test("survival: hand-computed Kaplan-Meier with censoring") {
    val implicits = spark.implicits
    import implicits._
    // horizon day 9, censorDays 3 -> censored iff last day > 6
    // u1,u2: days 0-1 (t=2, events); u3: days 2-4 (t=3, event);
    // u4: days 5-9 (t=5, censored); u5: days 0+9 (t=10, censored)
    val ev = Seq((0L, 1L), (86400L, 1L), (0L, 2L), (86400L, 2L),
      (2L * 86400L, 3L), (4L * 86400L, 3L),
      (5L * 86400L, 4L), (9L * 86400L, 4L),
      (0L, 5L), (9L * 86400L, 5L))
      .toDF("sec", "user_id")
      .select(col("sec").cast("timestamp").as("ts"), col("user_id"))
    val got = EventStreams.survival(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      (2L, 5L, 2L, 0L, 0.6),   // S = 3/5
      (3L, 3L, 1L, 0L, 0.4),   // S = 0.6 * 2/3
      (5L, 2L, 0L, 1L, 0.4),   // pure censoring: S unchanged
      (10L, 1L, 0L, 1L, 0.4)))
  }

  test("survival: d = n_risk absorbing step pins S to exactly 0") {
    val implicits = spark.implicits
    import implicits._
    // censorDays 0: every user is an observed event; all die at t=1
    val ev = Seq((0L, 1L), (0L, 2L), (0L, 3L))
      .toDF("sec", "user_id")
      .select(col("sec").cast("timestamp").as("ts"), col("user_id"))
    val got = EventStreams.survival(ev, censorDays = 0).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(4) == 0.0)
  }

  test("hazard: hand-computed Nelson-Aalen with censoring") {
    val implicits = spark.implicits
    import implicits._
    // same lifetimes as the survival test: H and var accumulate at
    // t=2 (2/5, 2/25) and t=3 (+1/3, +1/9); pure-censoring rows hold
    val ev = Seq((0L, 1L), (86400L, 1L), (0L, 2L), (86400L, 2L),
      (2L * 86400L, 3L), (4L * 86400L, 3L),
      (5L * 86400L, 4L), (9L * 86400L, 4L),
      (0L, 5L), (9L * 86400L, 5L))
      .toDF("sec", "user_id")
      .select(col("sec").cast("timestamp").as("ts"), col("user_id"))
    val got = EventStreams.hazard(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got(2L) == ((5L, 2L, 0.4, 0.08)))
    assert(got(3L) == ((3L, 1L, 0.733333, 0.191111)))
    assert(got(5L) == ((2L, 0L, 0.733333, 0.191111)))
    assert(got(10L) == ((1L, 0L, 0.733333, 0.191111)))
  }

  test("logRank: hand-computed two-arm statistic") {
    val implicits = spark.implicits
    import implicits._
    // same lifetimes as the survival test; arms by id parity:
    // grp1 = {u1, u3, u5} (n1 = 3), grp0 = {u2, u4} (n0 = 2)
    // t=2: n1r=3 n0r=2 d=2 d1=1 -> e1 += 1.2,      v += 2*(3/5)(2/5)(3/4)
    // t=3: n1r=2 n0r=1 d=1 d1=1 -> e1 += 2/3,      v += 1*(2/3)(1/3)(2/2)
    val ev = Seq((0L, 1L), (86400L, 1L), (0L, 2L), (86400L, 2L),
      (2L * 86400L, 3L), (4L * 86400L, 3L),
      (5L * 86400L, 4L), (9L * 86400L, 4L),
      (0L, 5L), (9L * 86400L, 5L))
      .toDF("sec", "user_id")
      .select(col("sec").cast("timestamp").as("ts"), col("user_id"))
    val r = EventStreams.logRank(ev).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    val e1 = 1.2 + 2.0 / 3.0
    val v = 2.0 * 0.6 * 0.4 * 0.75 + 2.0 / 9.0
    val z = (2.0 - e1) / math.sqrt(v)
    assert(math.abs(r.getDouble(3) - e1) < 1e-6)
    assert(math.abs(r.getDouble(4) - v) < 1e-6)
    assert(math.abs(r.getDouble(5) - z) < 1e-5)
    assert(math.abs(r.getDouble(6) - z * z) < 1e-5)
  }

  test("logRank: one-arm degenerate case reports NULL z") {
    val implicits = spark.implicits
    import implicits._
    // all users odd -> n0 = 0, every event expected (e1 = o1), V = 0
    val ev = Seq((0L, 1L), (0L, 3L), (86400L, 5L))
      .toDF("sec", "user_id")
      .select(col("sec").cast("timestamp").as("ts"), col("user_id"))
    val r = EventStreams.logRank(ev, censorDays = 0).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 0L)
    assert(r.getLong(2).toDouble == r.getDouble(3)) // o1 == e1
    assert(r.getDouble(4) == 0.0)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  test("annProbeCurve: identical vectors give full recall at any planes") {
    val implicits = spark.implicits
    import implicits._
    val emb = (0L to 11L).map(i => (i, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.annProbeCurve(emb).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 4L, 6L))
    got.foreach { r =>
      assert(r.getAs[Long]("n_queries") == 10L)
      assert(r.getAs[Long]("n_exact") == 20L) // only 2 corpus vectors
      assert(r.getAs[Double]("recall") == 1.0) // one shared bucket
    }
  }

  test("disparity: dominant tie raises Y above 1/k") {
    val implicits = spark.implicits
    import implicits._
    // (1,2) x3 + (1,3) x1: node 1 has k=2, s=4, Y = (9+1)/16
    val pall = Seq((1L, 2L), (1L, 2L), (1L, 2L), (1L, 3L)).toDF("a", "b")
    val got = algorithms.Structure.disparity(pall).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(2L).getAs[Long]("n_nodes") == 1L)
    assert(got(2L).getAs[Double]("mean_disparity") == 0.625)
    assert(got(1L).getAs[Long]("n_nodes") == 2L)
    assert(got(1L).getAs[Double]("mean_disparity") == 1.0)
  }

  test("winsorizedMean: hand-computed clamp on 10 values") {
    val implicits = spark.implicits
    import implicits._
    // values 1..10, alpha 0.1 -> k=1: clamp 1->2 and 10->9
    // winsorized mean = (2 + 2..9 + 9)/10 = (55 - 1 - 10 + 2 + 9)/10 = 5.5
    val docs = (1 to 10).map(i => (i.toLong, "a" * i, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("int"))
    val r = graft.pipeline.Robust.winsorizedMean(docs).collect()(0)
    assert(r.getAs[Long]("v_lo") == 2L && r.getAs[Long]("v_hi") == 9L)
    assert(r.getAs[Double]("winsor_mean") == 5.5)
  }

  test("zipfFit: exact power law recovers its exponent") {
    val implicits = spark.implicits
    import implicits._
    // terms t1..t4 with frequencies 8,4,2,1 plus rank ties broken
    // lexically; ln f = ln 8 - 1.0 * ln ... not an exact -1 law on
    // ranks 1..4 (freqs 8/4/2/1 vs ranks 1/2/3/4) — instead build
    // freq = 24/r exactly: r=1:24, r=2:12, r=3:8, r=4:6 -> slope -1, r2 1
    val words = Seq(("aa", 24), ("bb", 12), ("cc", 8), ("dd", 6))
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val docs = Seq((1L, text, "en", "s0")).toDF("doc_id", "text", "lang", "source")
    val r = graft.pipeline.Corpus.zipfFit(docs, k = 4).collect()(0)
    assert(r.getAs[Long]("k_used") == 4L)
    assert(r.getAs[Double]("slope") == -1.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }
}
