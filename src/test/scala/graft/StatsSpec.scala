package graft

import org.apache.spark.sql.DataFrame
import graft.pipeline.Stats

/** Closed-form statistics on tiny hand-computed datasets. */
class StatsSpec extends SparkSpec {
  import testImplicits._

  private lazy val testImplicits = spark.implicits

  private def docs(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("int"))

  test("featureCorr: perfectly linear features give r = 1") {
    // texts with k tokens of one char each: n_chars = 2k-1, ws_tokens = k
    val d = docs(
      (1L, "a", "en", "s0"),
      (2L, "a b", "en", "s0"),
      (3L, "a b c", "en", "s0"),
      (4L, "a b c d", "en", "s0"))
    val r = Stats.featureCorr(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(r(("n_chars", "ws_tokens")) == 1.0)
    // distinct types == ws_tokens here (all tokens distinct)
    assert(r(("ws_tokens", "distinct_types")) == 1.0)
  }

  test("featureCorr: anti-correlated features give r = -1") {
    // n_chars goes up as token count goes down
    val d = docs(
      (1L, "aaaaaaa", "en", "s0"),      // 7 chars, 1 token
      (2L, "aaa bb", "en", "s0"),       // 6 chars, 2 tokens
      (3L, "a b c", "en", "s0"))        // 5 chars, 3 tokens
    val r = Stats.featureCorr(d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getDouble(2)).toMap
    assert(r(("n_chars", "ws_tokens")) == -1.0)
  }

  test("linReg: exact fit tok = (nc+1)/2 recovered per source") {
    val d = docs(
      (1L, "a", "en", "s0"), (2L, "a b", "en", "s0"),
      (3L, "a b c", "en", "s0"),
      (4L, "x", "en", "s1"))             // n=1 → NULL fit
    val rows = Stats.linReg(d).collect()
    val s0 = rows.find(_.getString(0) == "s0").get
    assert(s0.getDouble(2) == 0.5)       // slope
    assert(s0.getDouble(3) == 0.5)       // intercept
    assert(s0.getDouble(4) == 1.0)       // r2
    val s1 = rows.find(_.getString(0) == "s1").get
    assert(s1.isNullAt(2) && s1.isNullAt(4))
  }

  test("mutualInfo: independent labels → MI 0; identical labels → MI = H") {
    // 2x2 uniform: lang ⟂ source
    val ind = docs(
      (1L, "t", "en", "s0"), (2L, "t", "en", "s1"),
      (3L, "t", "de", "s0"), (4L, "t", "de", "s1"))
    val r1 = Stats.mutualInfo(ind).collect()(0)
    assert(r1.getDouble(0) == 0.0)
    assert(r1.getDouble(1) == r1.getDouble(2)) // both H = ln 2
    assert(math.abs(r1.getDouble(1) - math.log(2)) < 1e-6)
    // lang determines source → MI = H(lang)
    val dep = docs(
      (1L, "t", "en", "s0"), (2L, "t", "en", "s0"),
      (3L, "t", "de", "s1"), (4L, "t", "de", "s1"))
    val r2 = Stats.mutualInfo(dep).collect()(0)
    assert(r2.getDouble(0) == r2.getDouble(1))
  }

  test("chiSquared: independence → chi2 0; perfect association → V = 1") {
    val ind = docs(
      (1L, "t", "en", "s0"), (2L, "t", "en", "s1"),
      (3L, "t", "de", "s0"), (4L, "t", "de", "s1"))
    val r1 = Stats.chiSquared(ind).collect()(0)
    assert(r1.getDouble(0) == 0.0 && r1.getLong(1) == 1L)
    val dep = docs(
      (1L, "t", "en", "s0"), (2L, "t", "en", "s0"),
      (3L, "t", "de", "s1"), (4L, "t", "de", "s1"))
    val r2 = Stats.chiSquared(dep).collect()(0)
    // 2x2 with perfect association: chi2 = n, V = 1
    assert(r2.getDouble(0) == 4.0 && r2.getDouble(2) == 1.0)
  }

  test("benford: digit from exact cents; frequencies sum to 1") {
    val d = Seq(123.45, 19.99, 1999.00, 0.0, -5.0, 950.01, 2.50)
      .toDF("v")
    val rows = Stats.benford(d, "v").collect()
    val byDigit = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0 and negative filtered; digits: 1 (123.45), 1 (19.99), 1 (1999.00),
    // 9 (950.01), 2 (2.50)
    assert(byDigit == Map(1L -> 3L, 2L -> 1L, 9L -> 1L))
    val freqSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(freqSum - 1.0) < 1e-9)
    // expected column is the Benford mass for that digit
    val e1 = rows.find(_.getLong(0) == 1L).get.getDouble(3)
    assert(math.abs(e1 - math.log10(2.0)) < 1e-6)
  }

  test("welchT: equal samples → t = 0; known two-sample value") {
    val d = Seq(
      (1L, "s0", 10), (2L, "s0", 20), (3L, "s0", 30),
      (4L, "s1", 10), (5L, "s1", 20), (6L, "s1", 30),
      (7L, "s2", 40), (8L, "s2", 50), (9L, "s2", 60))
      .toDF("doc_id", "source", "n_chars")
    val rows = Stats.welchT(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val same = rows(("s0", "s1"))
    assert(same.getDouble(4) == 0.0)
    // s0 vs s2: means 20 vs 50, var 100 each, n 3 →
    // t = -30 / sqrt(100/3 + 100/3) = -3.674235, df = 4
    val diff = rows(("s0", "s2"))
    assert(math.abs(diff.getDouble(4) - (-3.674235)) < 1e-6)
    assert(math.abs(diff.getDouble(5) - 4.0) < 1e-9)
  }

  test("ksBySource: disjoint supports → D = 1; identical → D = 0") {
    val d = Seq(
      (1L, "s0", 10), (2L, "s0", 20),
      (3L, "s1", 30), (4L, "s1", 40),   // s1 entirely above s0
      (5L, "s2", 10), (6L, "s2", 20),
      (7L, "s3", 10), (8L, "s3", 20))   // s2 ≡ s3 ≡ s0
      .toDF("doc_id", "source", "n_chars")
    val ks = Stats.ksBySource(d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(ks("s1") == 1.0)             // rest all ≤ 20, s1 all ≥ 30
    // s0 vs rest: rest = {30,40} ∪ {10,20}×2; at v=20 F_s0=1, F_rest=4/6
    assert(math.abs(ks("s0") - (1.0 - 4.0 / 6.0)) < 1e-6)
  }

  test("mannWhitney: separated samples hit U extremes; all-tied z is NULL") {
    val d = Seq(
      (1L, "s0", 1), (2L, "s0", 2),
      (3L, "s1", 3), (4L, "s1", 4))
      .toDF("doc_id", "source", "n_chars")
    val r = Stats.mannWhitneyBySource(d).collect()
      .map(x => x.getString(0) -> x).toMap
    // s0 entirely below the rest: U = 0; s1 entirely above: U = n_s·n_r
    assert(r("s0").getDouble(2) == 0.0 && r("s1").getDouble(2) == 4.0)
    // z(s0) = (0 − 2)/sqrt(5/3) = −1.549193
    assert(math.abs(r("s0").getDouble(3) - (-1.549193)) < 1e-6)
    val tied = Seq((1L, "s0", 5), (2L, "s0", 5), (3L, "s1", 5), (4L, "s1", 5))
      .toDF("doc_id", "source", "n_chars")
    val t = Stats.mannWhitneyBySource(tied).collect()
      .map(x => x.getString(0) -> x).toMap
    // all mass tied: U = n_s·n_r/2 (pure tie credit), variance 0 → NULL z
    assert(t("s0").getDouble(2) == 2.0 && t("s0").isNullAt(3))
  }

  test("heapsFit: two exact power-law points recover beta = 1") {
    val d = docs(
      (1L, "a b a b", "en", "s0"),          // N=4, V=2
      (2L, "a b c d a b c d", "en", "s1"))  // N=8, V=4
    val r = Stats.heapsFit(d).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)       // beta
    assert(math.abs(r.getDouble(2) - (-math.log(2))) < 1e-6) // ln_k
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-6)       // r2
  }

  test("theilBySource: equal values → 0; hand-computed two-value case") {
    val d = Seq(
      (1L, "s0", 10), (2L, "s0", 10), (3L, "s0", 10),
      (4L, "s1", 10), (5L, "s1", 30))
      .toDF("doc_id", "source", "n_chars")
    val t = Stats.theilBySource(d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(t("s0") == 0.0)
    // (10·ln10 + 30·ln30)/40 − ln 20 = 0.130812
    assert(math.abs(t("s1") - 0.130812) < 1e-6)
  }

  test("jsdBySource: identical distributions → 0; disjoint vocab value") {
    val same = docs((1L, "a b", "en", "s0"), (2L, "a b", "en", "s1"))
    assert(Stats.jsdBySource(same).collect().forall(_.getDouble(1) == 0.0))
    // s0 = δ_a, s1 = δ_b, corpus = uniform{a,b}:
    // JSD(δ, U) = ½ln(4/3) + ½(½ln(2/3) + ½ln2) = 0.215762
    val disj = docs((1L, "a a", "en", "s0"), (2L, "b b", "en", "s1"))
    val j = Stats.jsdBySource(disj).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(j("s0") - 0.215762) < 1e-6)
    assert(j("s0") == j("s1"))
  }

  test("docEntropy: uniform tokens → H = ln k; single type → 0 and NULL norm") {
    val d = docs(
      (1L, "a b c d", "en", "s0"),     // 4 uniform types: H = ln 4, norm 1
      (2L, "a a a a", "en", "s0"),     // single type: H = 0, norm NULL
      (3L, "a a b b", "en", "s0"))     // 2 types uniform: H = ln 2
    val rows = Stats.docEntropy(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(math.abs(rows(1L).getDouble(3) - math.log(4)) < 1e-6)
    assert(rows(1L).getDouble(4) == 1.0)
    assert(rows(2L).getDouble(3) == 0.0 && rows(2L).isNullAt(4))
    assert(math.abs(rows(3L).getDouble(3) - math.log(2)) < 1e-6)
    assert(rows(3L).getDouble(4) == 1.0)
  }

  test("lexicalProfile: all-hapax vs all-repeat hand values") {
    val d = docs(
      (1L, "a b c d", "en", "s0"),     // 4 types, all hapax: K = 0
      (2L, "x x x x", "en", "s1"))     // 1 type c=4: K = 1e4·12/16 = 7500
    val rows = Stats.lexicalProfile(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val s0 = rows("s0")
    assert(s0.getLong(1) == 4 && s0.getLong(2) == 4)
    assert(s0.getDouble(3) == 1.0)              // hapax ratio
    assert(s0.getDouble(4) == 0.0)              // Yule K
    assert(s0.getDouble(5) == 0.0)              // Simpson
    val s1 = rows("s1")
    assert(s1.getDouble(3) == 0.0)
    assert(s1.getDouble(4) == 7500.0)
    assert(s1.getDouble(5) == 1.0)              // always a repeat
  }

  test("readability: known counts; punctuation-free doc clamps to 1 sentence") {
    // "go! go now." → w=3, s=2 ([!]+ and [.]+ runs), y=3 (o, o, o[w skips a? 'now'→o]);
    // wait: vowels groups: "go"→o, "go"→o, "now"→o = 3
    val d = docs((1L, "go! go now.", "en", "s0"),
      (2L, "xyz", "en", "s1"))        // no [.!?] → clamped s=1; y: 'y' run = 1
    val rows = Stats.readability(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val s0 = rows("s0")
    assert(s0.getLong(1) == 3 && s0.getLong(2) == 2 && s0.getLong(3) == 3)
    assert(s0.getDouble(4) ==
      math.rint((206.835 - 1.015 * 3.0 / 2.0 - 84.6 * 3.0 / 3.0) * 1e4) / 1e4)
    val s1 = rows("s1")
    assert(s1.getLong(2) == 1 && s1.getLong(3) == 1)
  }

  test("naiveBayes: separable sources go diagonal; exact tie breaks to min class") {
    // Corpus symmetric under a↔c, b↔d, s0↔s1 — so both probe docs
    // ("a c" and "c a") score IDENTICALLY under the two classes
    // (ln5+ln2 vs ln2+ln5, same prior, same N_c+V) → tiebreak
    // predicts the alphabetically-first class s0 for both.
    val d = docs(
      (1L, "a a b", "en", "s0"), (2L, "a b", "en", "s0"),
      (3L, "a c", "en", "s0"),
      (4L, "c c d", "en", "s1"), (5L, "c d", "en", "s1"),
      (6L, "c a", "en", "s1"))
    val m = graft.pipeline.Classify.naiveBayesConfusion(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m((("s0", "s0"))) == 3L)   // incl. the tied probe
    assert(m((("s1", "s1"))) == 2L)
    assert(m((("s1", "s0"))) == 1L)   // the other tied probe
    assert(m.values.sum == 6L)
  }

  test("anovaF: separated groups hit the textbook F; equal means → F = 0") {
    // s0 lengths {1,2,3}, s1 {4,5,6}: SSB = 13.5, SSW = 4, F = 13.5
    val d = docs(
      (1L, "a", "en", "s0"), (2L, "ab", "en", "s0"),
      (3L, "abc", "en", "s0"),
      (4L, "abcd", "en", "s1"), (5L, "abcde", "en", "s1"),
      (6L, "abcdef", "en", "s1"))
    val r = Stats.anovaF(d).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 13.5 && r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 13.5)
    // identical groups: between-variance exactly 0
    val e = docs(
      (1L, "a", "en", "s0"), (2L, "abc", "en", "s0"),
      (3L, "a", "en", "s1"), (4L, "abc", "en", "s1"))
    val re = Stats.anovaF(e).collect()(0)
    assert(re.getDouble(2) == 0.0 && re.getDouble(4) == 0.0)
  }

  test("kruskalWallis: no-tie textbook H; all-tied corpus → NULL corrected") {
    // s0 ranks {1,2,3}, s1 {4,5,6}: H = 12/42·(12+75) − 21 = 27/7
    val d = docs(
      (1L, "a", "en", "s0"), (2L, "ab", "en", "s0"),
      (3L, "abc", "en", "s0"),
      (4L, "abcd", "en", "s1"), (5L, "abcde", "en", "s1"),
      (6L, "abcdef", "en", "s1"))
    val r = Stats.kruskalWallis(d).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 3.857143)         // round(27/7, 6)
    assert(r.getDouble(3) == 3.857143)         // no ties: corrected = raw
    // every value tied: correction denominator 0 → NULL corrected
    val t = docs(
      (1L, "a", "en", "s0"), (2L, "b", "en", "s1"),
      (3L, "c", "en", "s0"))
    val rt = Stats.kruskalWallis(t).collect()(0)
    assert(rt.getDouble(2) == 0.0 && rt.isNullAt(3))
  }

  test("spearman: monotone → 1, anti-monotone → −1, ties averaged") {
    // nonlinear but monotone: nc = 2k−1, nt = k
    val mono = docs(
      (1L, "a", "en", "s0"), (2L, "a b", "en", "s0"),
      (3L, "a b c", "en", "s0"), (4L, "a b c d", "en", "s0"))
    assert(Stats.spearman(mono).collect()(0).getDouble(1) == 1.0)
    val anti = docs(
      (1L, "aaaaaaa", "en", "s0"), (2L, "aaa bb", "en", "s0"),
      (3L, "a b c", "en", "s0"))
    assert(Stats.spearman(anti).collect()(0).getDouble(1) == -1.0)
    // tied blocks in BOTH features rank-average to identical vectors
    val tied = docs(
      (1L, "a", "en", "s0"), (2L, "b", "en", "s0"),
      (3L, "a b", "en", "s0"))
    assert(Stats.spearman(tied).collect()(0).getDouble(1) == 1.0)
  }

  private def lenDocs(rows: (Long, Int, String)*): DataFrame =
    docs(rows.map { case (id, len, src) => (id, "a" * len, "en", src) }: _*)

  test("cohensD: hand-computed two-group effect size + Hedges correction") {
    // s0 = {1,3} (mean 2, var 2), s1 = {5,7} (mean 6, var 2)
    // pooled sd = sqrt(2) → d = -4/sqrt(2), g = d * (1 - 3/7)
    val d = lenDocs((1L, 1, "s0"), (2L, 3, "s0"), (3L, 5, "s1"), (4L, 7, "s1"))
    val r = Stats.cohensD(d).collect()(0)
    assert(r.getAs[Double]("d") == BigDecimal(-4.0 / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("g") == BigDecimal(-4.0 / math.sqrt(2.0) * 4.0 / 7.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("cliffsDelta: fully separated groups give delta ±1, large") {
    val d = lenDocs((1L, 1, "s0"), (2L, 2, "s0"), (3L, 3, "s1"), (4L, 4, "s1"))
    val rows = Stats.cliffsDelta(d).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("delta"),
        r.getAs[String]("magnitude"))).toMap
    assert(rows("s0") == ((-1.0, "large")))
    assert(rows("s1") == ((1.0, "large")))
  }

  test("brownForsythe: hand-computed W on two 3-doc groups") {
    // s0 = {1, 2, 10} median 2 → z2 = {2,0,16}... using engine's
    // z2 = |2x − 2·med|: {2·1−4|=2? no: |2−4|=2, |4−4|=0, |20−4|=16}
    // wait: x={1,2,10}, med=2, z2 = {|2-4|=2, |4-4|=0, |20-4|=16}
    // s1 = {5, 6, 7} med 6 → z2 = {2, 0, 2}
    // group means: 6, 4/3; grand 22/6=11/3
    // ssb = 3(6-11/3)^2 + 3(4/3-11/3)^2 = 3(49/9) + 3(49/9) = 98/3
    // ssw = (2-6)^2+(0-6)^2+(16-6)^2 + (2-4/3)^2+(0-4/3)^2+(2-4/3)^2
    //     = 16+36+100 + (4+16+4)/9 = 152 + 8/3 = 464/3
    // W = (98/3)/1 / ((464/3)/4) = 98*4/464 = 392/464
    val d = lenDocs((1L, 1, "s0"), (2L, 2, "s0"), (3L, 10, "s0"),
      (4L, 5, "s1"), (5L, 6, "s1"), (6L, 7, "s1"))
    val r = Stats.brownForsythe(d).collect()(0)
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 6L)
    assert(r.getAs[Double]("w") == BigDecimal(392.0 / 464.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("jarqueBera: symmetric 3-point distribution has skew 0, excess kurtosis -1.5") {
    val d = lenDocs((1L, 1, "s0"), (2L, 2, "s0"), (3L, 3, "s0"))
    val r = Stats.jarqueBera(d).collect()(0)
    assert(r.getAs[Double]("skewness") == 0.0)
    assert(r.getAs[Double]("kurtosis") == -1.5)
    assert(r.getAs[Double]("jb") == 0.28125)
  }

  test("bootstrapMeanCi: constant values collapse the interval onto the mean") {
    // 40 docs, all n_chars identical per source: every resample mean
    // with any weight > 0 equals the constant, so lo = hi = mean
    val d = (0L until 40L).map { i =>
      val src = if (i % 2 == 0) "s0" else "s1"
      val text = if (i % 2 == 0) "aaaaaaaaaa" else "aaaaa" // 10 vs 5 chars
      (i, text, "en", src)
    }
    val r = Stats.bootstrapMeanCi(docs(d: _*)).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("s0").getAs[Long]("n_docs") == 20L)
    assert(r("s0").getAs[Double]("mean") == 10.0)
    assert(r("s0").getAs[Double]("boot_lo") == 10.0)
    assert(r("s0").getAs[Double]("boot_hi") == 10.0)
    assert(r("s1").getAs[Double]("mean") == 5.0)
    assert(r("s1").getAs[Double]("boot_lo") == 5.0 &&
      r("s1").getAs[Double]("boot_hi") == 5.0)
    assert(r("s0").getAs[Long]("n_resamples") <= 32L &&
      r("s0").getAs[Long]("n_resamples") >= 30L) // den=0 resamples are rare
  }

  test("bootstrapMeanCi: interval brackets the mean and is deterministic") {
    val rnd = new scala.util.Random(11)
    val d = (0L until 60L).map { i =>
      (i, "a" * (20 + rnd.nextInt(200)), "en", "s0")
    }
    val frame = docs(d: _*)
    val a = Stats.bootstrapMeanCi(frame).collect()(0)
    val b = Stats.bootstrapMeanCi(frame.repartition(7)).collect()(0)
    assert(a.toSeq == b.toSeq) // hash weights: partition-independent
    val (lo, mu, hi) = (a.getAs[Double]("boot_lo"), a.getAs[Double]("mean"),
      a.getAs[Double]("boot_hi"))
    assert(lo < mu && mu < hi, s"CI ($lo, $hi) should bracket mean $mu")
    assert(hi - lo < 100.0) // sane width for 60 docs of range-200 lengths
  }

  test("bootstrapMeanCi: den=0 resamples rank OUT of the CI picks (tiny source)") {
    // a 1-doc source: each resample is den=0 with P = e^-1 ≈ 37%, so at
    // B = 32 some resamples are deterministically NULL for any fixed
    // doc_id; the high pick must rank against the NON-NULL count (2nd-
    // largest usable mean), not b-1 (which would land on a NULL or the
    // largest). With one doc every usable mean equals the doc length, so
    // the picks collapse onto it — but ONLY if the ranks stay in the
    // non-null prefix.
    val d = Seq((1L, "a" * 7, "en", "tiny")) ++
      (10L until 30L).map(i => (i, "a" * 50, "en", "big"))
    val r = Stats.bootstrapMeanCi(docs(d: _*)).collect()
      .map(x => x.getString(0) -> x).toMap
    val nTiny = r("tiny").getAs[Long]("n_resamples")
    assert(nTiny < 32L && nTiny > 3L) // NULL resamples exist, CI still formed
    assert(r("tiny").getAs[Double]("boot_lo") == 7.0)
    assert(r("tiny").getAs[Double]("boot_hi") == 7.0) // rn = nn-1 is non-null
    assert(r("big").getAs[Long]("n_resamples") == 32L)
  }

  test("poissonCdf weights: thresholds are a valid CDF prefix") {
    val c = Stats.poissonCdf
    assert(c.size == 7 && c.sliding(2).forall(p => p(0) < p(1)))
    assert(math.abs(c.head - math.exp(-1.0)) < 1e-15)
    assert(c.last > 0.9999 && c.last < 1.0)
  }

  test("filterKappa: matches the local replay of the two gates") {
    // mixed corpus: some docs pass both gates, some fail one
    val rows = (1L to 24L).map { i =>
      val txt =
        if (i % 4 == 0) "the cat is a dog and of the rest " * 8
        else if (i % 4 == 1) "zz " * 30 // alpha-heavy single repeat: fails top_frac
        else if (i % 4 == 2) "the quick brown fox is a very lazy kind of dog today " * 3
        else "x" // too short
      (i, txt.trim, "en", s"s${i % 3}")
    }
    val d = docs(rows: _*)
    val a = graft.pipeline.TextOps.quality(d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Double]("quality") >= 0.5)).toMap
    val b = graft.pipeline.Corpus.gopherRules(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Boolean]("keep")).toMap
    val n = a.size
    val n11 = a.keys.count(k => a(k) && b(k))
    val n10 = a.keys.count(k => a(k) && !b(k))
    val n01 = a.keys.count(k => !a(k) && b(k))
    val n00 = a.keys.count(k => !a(k) && !b(k))
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) +
      (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    val r = Stats.filterKappa(d).collect().head
    assert(r.getAs[Long]("n") == n.toLong)
    assert(r.getAs[Long]("n11") == n11.toLong)
    assert(r.getAs[Long]("n00") == n00.toLong)
    assert(math.abs(r.getAs[Double]("po") - po) < 1e-6)
    assert(math.abs(r.getAs[Double]("pe") - pe) < 1e-6)
    if (pe < 1.0)
      assert(math.abs(r.getAs[Double]("kappa") - (po - pe) / (1 - pe)) < 1e-5)
    // the fixture must actually exercise disagreement
    assert(n10 + n01 > 0 && n11 + n00 > 0)
  }

  test("calibrationEce: matches the local replay of bins and the ECE sum") {
    val rows = (1L to 24L).map { i =>
      val txt =
        if (i % 4 == 0) "the cat is a dog and of the rest " * 8
        else if (i % 4 == 1) "zz " * 30
        else if (i % 4 == 2) "the quick brown fox is a very lazy kind of dog today " * 3
        else "x"
      (i, txt.trim, "en", s"s${i % 3}")
    }
    val d = docs(rows: _*)
    val q = graft.pipeline.TextOps.quality(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    val keep = graft.pipeline.Corpus.gopherRules(d).collect()
      .map(r => r.getLong(0) -> (if (r.getAs[Boolean]("keep")) 1L else 0L))
      .toMap
    val byBin = q.keys.toSeq
      .groupBy(k => math.min(math.floor(q(k) * 10.0), 9.0).toLong)
    val n = q.size.toDouble
    val eceLocal = byBin.map { case (_, ks) =>
      val conf = ks.map(q).sum / ks.size
      val acc = ks.map(keep).sum.toDouble / ks.size
      (ks.size / n) * math.abs(acc - conf)
    }.sum
    val got = Stats.calibrationEce(d).collect()
    assert(got.map(_.getLong(0)).toSet == byBin.keySet)
    got.foreach { r =>
      val ks = byBin(r.getLong(0))
      assert(r.getLong(1) == ks.size.toLong)
      assert(math.abs(r.getAs[Double]("conf") - ks.map(q).sum / ks.size) < 1e-6)
      assert(math.abs(r.getAs[Double]("acc") -
        ks.map(keep).sum.toDouble / ks.size) < 1e-6)
      assert(math.abs(r.getAs[Double]("ece") - eceLocal) < 1e-6)
    }
  }

  test("compressionRatio: repetitive text collapses, varied text does not") {
    val rep = ("ab" * 1000, "en", "rep")
    val varied = ((1 to 200).map(i => s"w${i * 7919 % 9973}")
      .mkString(" "), "en", "var")
    val d = docs(Seq(rep, varied).zipWithIndex.map { case ((t, l, s), i) =>
      (i.toLong + 1L, t, l, s) }: _*)
    val got = graft.pipeline.TextOps.compressionRatio(d).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("rep").getAs[Double]("mean_ratio") < 0.05)
    assert(got("rep").getAs[Long]("n_repetitive") == 1L)
    assert(got("var").getAs[Double]("mean_ratio") > 0.35)
    assert(got("var").getAs[Long]("n_repetitive") == 0L)
    // deterministic: a second run reads identical ratios
    val again = graft.pipeline.TextOps.compressionRatio(d).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("mean_ratio")).toMap
    got.foreach { case (s, r) =>
      assert(again(s) == r.getAs[Double]("mean_ratio")) }
  }

  test("effectiveRank: isotropic 2-D data reads PR = 2; rank-1 reads 1") {
    val implicits = spark.implicits
    import implicits._
    val iso = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), (2L, Array(-1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)), (4L, Array(0.0f, -1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = graft.pipeline.Pca.effectiveRank(iso).collect().head
    assert(r.getAs[Long]("n_dims") == 3L)
    assert(r.getAs[Double]("trace") == 1.0) // diag(.5, .5, 0)
    assert(math.abs(r.getAs[Double]("effective_rank") - 2.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("rank_share") - 2.0 / 3.0) < 1e-6)
    val rank1 = (1L to 6L).map(i =>
      (i, Array(i.toFloat, 2 * i.toFloat, 2 * i.toFloat)))
      .toDF("vec_id", "embedding")
    val r1 = graft.pipeline.Pca.effectiveRank(rank1).collect().head
    assert(math.abs(r1.getAs[Double]("effective_rank") - 1.0) < 1e-5)
  }
}
