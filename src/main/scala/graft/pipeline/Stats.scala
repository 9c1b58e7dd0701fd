package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus statistics and hypothesis tests — the "is this data what I
  * think it is" layer a training-data pipeline runs before committing
  * a mix: feature correlation, per-source regression fits, association
  * tests between categorical columns (mutual information, χ²/Cramér's
  * V), Benford leading-digit screening for synthetic/fabricated
  * numeric columns, and Welch's t between source populations.
  *
  * Every operator here is a SINGLE map-side-combined aggregation over
  * exact integer sums (counts, Σx, Σx², Σxy as BIGINTs), with the
  * floating-point arithmetic applied once to the aggregated scalars in
  * a fixed operator order the DuckDB oracles mirror term for term.
  * That makes them bit-reproducible across engines AND the cheapest
  * possible shape at 100 TB: one pass, constant aggregate state, no
  * shuffle wider than the (tiny) group-key cardinality.
  *
  * Reference scope note: rs-graphdb's surface stops at
  * count/sum/avg/percentile/stdev (`src/query.rs:24-31`); this module
  * is part of the brief-mandated training-pipeline extension.
  */
object Stats {

  /** Exact per-doc integer features shared by the fits below:
    * n_chars (stored), whitespace tokens, distinct token types. */
  private def docFeatures(docs: DataFrame): DataFrame =
    docs.select(
      col("n_chars").cast("long").as("nc"),
      regexp_count(col("text"), lit("[^ ]+")).cast("long").as("nt"),
      size(array_distinct(filter(split(col("text"), " "),
        t => t =!= ""))).cast("long").as("ny"),
      col("source"))

  private def pearson(n: Column, sx: Column, sy: Column, sxx: Column,
                      syy: Column, sxy: Column): Column =
    (n * sxy - sx * sy).cast("double") /
      (sqrt((n * sxx - sx * sx).cast("double")) *
        sqrt((n * syy - sy * sy).cast("double")))

  /** Exact second-moment accumulator: operands widen to DECIMAL(19,0)
    * BEFORE the multiply (the x·y PRODUCT itself overflows int64 past
    * values of ~3·10⁹, so casting after would be too late), giving
    * DECIMAL(38,0) products and sums — exact to ~10³⁸, where BIGINT
    * Σx² overflows past ~10¹⁰ docs of 10⁴-char text, i.e. inside the
    * 100 TB envelope (the DuckDB oracles accumulate the same sums as
    * HUGEINT). First moments (Σx) keep BIGINT: they are 10⁹× smaller
    * and safe to ~10¹⁴ docs. */
  private def sumSq(x: Column, y: Column): Column =
    sum(x.cast("decimal(19,0)") * y.cast("decimal(19,0)"))

  /** Pearson correlation matrix over the document feature triple
    * (n_chars, ws_tokens, distinct_types) in long format: one row per
    * unordered feature pair. All nine sums come out of ONE aggregation
    * (exact BIGINT state, 10 numbers total); the three r values are
    * closed-form over that single row — the classic sufficient-
    * statistics shape, one corpus pass at any scale. */
  def featureCorr(docs: DataFrame): DataFrame = {
    val a = docFeatures(docs).agg(
      count(lit(1)).as("n"),
      sum("nc").as("sc"), sum("nt").as("st"), sum("ny").as("sy"),
      sumSq(col("nc"), col("nc")).as("scc"),
      sumSq(col("nt"), col("nt")).as("stt"),
      sumSq(col("ny"), col("ny")).as("syy"),
      sumSq(col("nc"), col("nt")).as("sct"),
      sumSq(col("nc"), col("ny")).as("scy"),
      sumSq(col("nt"), col("ny")).as("sty"))
    val row = broadcast(a)
    def pair(x: String, y: String, sx: String, sy0: String, sxx: String,
             syy0: String, sxy: String): DataFrame =
      row.select(lit(x).as("x_col"), lit(y).as("y_col"),
        round(pearson(col("n"), col(sx), col(sy0), col(sxx), col(syy0),
          col(sxy)), 6).as("r"))
    pair("n_chars", "ws_tokens", "sc", "st", "scc", "stt", "sct")
      .unionAll(pair("n_chars", "distinct_types", "sc", "sy", "scc", "syy", "scy"))
      .unionAll(pair("ws_tokens", "distinct_types", "st", "sy", "stt", "syy", "sty"))
      .orderBy("x_col", "y_col")
  }

  /** Per-source least-squares fit ws_tokens ~ n_chars: slope,
    * intercept, r² — "does this source's token-per-char rate look like
    * the others", the drift screen run before trusting a source's
    * token-count accounting. Exact integer sufficient statistics per
    * source (6 BIGINTs of state), closed-form fit on the aggregated
    * row. Sources with n < 2 or zero x-variance yield NULL fits rather
    * than dividing by zero. */
  def linReg(docs: DataFrame): DataFrame = {
    val s = docFeatures(docs).groupBy("source").agg(
      count(lit(1)).as("n"),
      sum("nc").as("sx"), sum("nt").as("sy"),
      sumSq(col("nc"), col("nc")).as("sxx"),
      sumSq(col("nt"), col("nt")).as("syy"),
      sumSq(col("nc"), col("nt")).as("sxy"))
    val dxx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val slope = when(col("n") >= 2 && dxx > 0.0,
      (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") / dxx)
    val r = pearson(col("n"), col("sx"), col("sy"), col("sxx"), col("syy"),
      col("sxy"))
    s.select(col("source"), col("n"),
        round(slope, 6).as("slope"),
        round((col("sy").cast("double") -
          slope * col("sx").cast("double")) / col("n").cast("double"), 6)
          .as("intercept"),
        round(when(col("n") >= 2 && dxx > 0.0, r * r), 6).as("r2"))
      .orderBy("source")
  }

  /** Mutual information between two categorical columns (default
    * lang × source) with the two marginal entropies — "are my language
    * and source labels entangled", the stratification sanity check
    * before per-source language quotas. One (a, b) count shuffle
    * (cells ≤ |A|·|B|), marginals derived from the cells, everything
    * else scalar. Natural log, the same `ln` the KL/PMI family uses. */
  def mutualInfo(docs: DataFrame, aCol: String = "lang",
                 bCol: String = "source"): DataFrame = {
    val cells = docs.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c"))
    val ma = cells.groupBy("a").agg(sum("c").as("ca"))
    val mb = cells.groupBy("b").agg(sum("c").as("cb"))
    val nDf = cells.agg(sum("c").cast("double").as("n"))
    val mi = cells
      .join(broadcast(ma), Seq("a")).join(broadcast(mb), Seq("b"))
      .crossJoin(broadcast(nDf))
      .agg(round(sum((col("c").cast("double") / col("n")) *
        log((col("c").cast("double") * col("n")) /
          (col("ca").cast("double") * col("cb")))), 6).as("mi"))
    def entropy(m: DataFrame, cnt: String, out: String): DataFrame =
      m.crossJoin(broadcast(nDf))
        .agg(round(-sum((col(cnt).cast("double") / col("n")) *
          log(col(cnt).cast("double") / col("n"))), 6).as(out))
    mi.crossJoin(broadcast(entropy(ma, "ca", "h_a")))
      .crossJoin(broadcast(entropy(mb, "cb", "h_b")))
  }

  /** χ² test of independence for two categorical columns (default
    * lang × source): the statistic, degrees of freedom, and Cramér's V
    * — the effect-size the χ² lacks. Uses the observed-cell closed
    * form χ² = Σ o²/e − n (with e = row·col/n), which accounts for
    * EMPTY contingency cells — each contributes exactly its e — without
    * ever materializing the |A|×|B| cross product; only observed cells
    * flow through the one count shuffle. greatest(·, 0) guards the
    * exact-independence case against a −1 ulp under the sqrt. */
  def chiSquared(docs: DataFrame, aCol: String = "lang",
                 bCol: String = "source"): DataFrame = {
    val cells = docs.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c"))
    val chi2 = greatest(col("_s") - col("_n"), lit(0.0))
    cells
      .join(broadcast(cells.groupBy("a").agg(sum("c").as("ca"))), Seq("a"))
      .join(broadcast(cells.groupBy("b").agg(sum("c").as("cb"))), Seq("b"))
      .crossJoin(broadcast(cells.agg(sum("c").cast("double").as("n"))))
      .agg(
        sum(col("c").cast("double") * col("c").cast("double") * col("n") /
          (col("ca").cast("double") * col("cb").cast("double"))).as("_s"),
        countDistinct("a").as("_ka"), countDistinct("b").as("_kb"),
        first("n").as("_n"))
      .select(round(chi2, 6).as("chi2"),
        ((col("_ka") - 1) * (col("_kb") - 1)).cast("long").as("dof"),
        round(sqrt(chi2 /
          (col("_n") * least(col("_ka") - 1, col("_kb") - 1)
            .cast("double"))), 6).as("cramers_v"))
  }

  /** Benford leading-digit screen over a positive numeric column
    * (default orders.o_totalprice): per digit 1–9 the observed count,
    * observed frequency, the Benford expectation ln(1+1/d)/ln(10), and
    * the signed deviation. Fabricated or unit-mixed numeric columns
    * jump out here long before a distribution test would flag them.
    * The digit is read off the value scaled to exact integer cents
    * (round(x·100) as BIGINT, then the first character of the integer
    * rendering): integer-to-string is engine-identical, where
    * ⌊log10 x⌋ on a double can flip by a libm ulp at exact powers of
    * ten. CENTS-GRANULARITY ASSUMPTION: the digit is taken from the
    * value rounded to cents, so positive values below 0.005 round to
    * zero cents (no leading digit) and are excluded — the explicit
    * `digit BETWEEN 1 AND 9` gate below keeps the output inside the
    * Benford domain for ANY numeric column, not just o_totalprice.
    * One narrow map + 9-group aggregate. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val digit = substring(round(x * lit(100.0)).cast("long").cast("string"),
      1, 1).cast("long")
    val d = df.filter(x > 0.0).select(digit.as("digit"))
      .filter(col("digit").between(1L, 9L))
      .groupBy("digit").agg(count(lit(1)).as("cnt"))
    val tot = d.agg(sum("cnt").cast("double").as("n"))
    val expected = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
      log(lit(10.0))
    d.crossJoin(broadcast(tot))
      .select(col("digit"), col("cnt"),
        round(col("cnt").cast("double") / col("n"), 6).as("freq"),
        round(expected, 6).as("expected"),
        round(col("cnt").cast("double") / col("n") - expected, 6).as("dev"))
      .orderBy("digit")
  }

  /** Welch's unequal-variance t statistic for mean n_chars between
    * every unordered pair of sources, with the Welch–Satterthwaite
    * degrees of freedom — the pairwise "are these two sources the same
    * population" screen. Per-source sufficient statistics first (one
    * pass — n and Σx BIGINT, Σx² DECIMAL(38,0) via [[sumSq]]), then a
    * |S|²-bounded broadcast self-join of the tiny aggregate frame: the
    * corpus is read once no matter how many sources. Pairs where
    * either side has n < 2 or both sample variances are 0 yield NULL
    * t. */
  def welchT(docs: DataFrame): DataFrame = {
    val s = docs.groupBy("source").agg(
      count(lit(1)).as("n"), sum(col("n_chars").cast("long")).as("sx"),
      sumSq(col("n_chars").cast("long"), col("n_chars").cast("long"))
        .as("sxx"))
    def side(tag: String): DataFrame =
      s.select(col("source").as(s"src_$tag"), col("n").as(s"n_$tag"),
        (col("sx").cast("double") / col("n")).as(s"m_$tag"),
        when(col("n") >= 2,
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") /
              col("n").cast("double")) / (col("n") - 1).cast("double"))
          .as(s"v_$tag"))
    val a = side("a"); val b = broadcast(side("b"))
    val sea = col("v_a") / col("n_a").cast("double")
    val seb = col("v_b") / col("n_b").cast("double")
    val se2 = sea + seb
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        col("n_a"), col("n_b"),
        round(when(se2 > 0.0,
          (col("m_a") - col("m_b")) / sqrt(se2)), 6).as("t"),
        round(when(se2 > 0.0, se2 * se2 /
          (sea * sea / (col("n_a") - 1).cast("double") +
            seb * seb / (col("n_b") - 1).cast("double"))), 6).as("df"))
      .orderBy("src_a", "src_b")
  }

  /** Two-sample Kolmogorov–Smirnov D per source, each source against
    * the REST of the corpus, over an integer-valued column (default
    * n_chars): D = max over the value grid of |F_src − F_rest|. The
    * grid is (distinct values × sources) — bounded by the VALUE DOMAIN
    * times the source count, not the corpus size — so the per-source
    * cumulative windows are partitioned (one source per partition) and
    * each partition holds at most |domain| rows at any scale. Counts
    * and cumulative counts stay exact BIGINTs; the two ECDF divisions
    * and their difference are the only double ops. */
  def ksBySource(docs: DataFrame, valueCol: String = "n_chars"): DataFrame = {
    val cnt = docs
      .groupBy(col(valueCol).cast("long").as("v"), col("source"))
      .agg(count(lit(1)).as("c"))
    val grid = cnt.select("v").distinct()
      .crossJoin(broadcast(cnt.select("source").distinct()))
    val cum = grid.join(cnt, Seq("v", "source"), "left")
      .select(col("v"), col("source"), coalesce(col("c"), lit(0L)).as("c"))
      .withColumn("cum",
        sum("c").over(Window.partitionBy("source").orderBy("v")))
    val cumAll = cum.groupBy("v").agg(sum("cum").as("cum_all"))
    val totals = cnt.groupBy("source").agg(sum("c").as("n_s"))
    val grand = cnt.agg(sum("c").as("n_all"))
    cum.join(cumAll, Seq("v"))
      .join(broadcast(totals), Seq("source"))
      .crossJoin(broadcast(grand))
      .groupBy("source")
      .agg(first("n_s").as("n_s"),
        round(max(abs(col("cum").cast("double") / col("n_s") -
          (col("cum_all") - col("cum")).cast("double") /
            (col("n_all") - col("n_s")))), 6).as("d_stat"))
      .orderBy("source")
  }

  /** Mann–Whitney U per source against the rest of the corpus over an
    * integer-valued column (default n_chars), with the tie-corrected
    * normal-approximation z — the nonparametric location test that
    * pairs with [[ksBySource]]'s shape test. Everything up to the final
    * z is EXACT integer arithmetic: 2U = Σ_v c_s(v)·(2·C_rest(<v) +
    * c_rest(v)) accumulates in half-unit BIGINTs, and the pooled tie
    * term Σ(t³−t) is integer too. Same bounded shapes as the KS plan —
    * per-source windows on the (value, source) count frame plus one
    * value-domain-bounded pooled window; nothing scales with the
    * corpus beyond the first count shuffle. */
  def mannWhitneyBySource(docs: DataFrame,
                          valueCol: String = "n_chars"): DataFrame = {
    val cnt = docs
      .groupBy(col(valueCol).cast("long").as("v"), col("source"))
      .agg(count(lit(1)).as("c"))
    val all = cnt.groupBy("v").agg(sum("c").as("c_all"))
      .withColumn("cum_all",
        sum("c_all").over(Window.orderBy("v")))
    val cumS = cnt.withColumn("cum_s",
      sum("c").over(Window.partitionBy("source").orderBy("v")))
    val totals = cnt.groupBy("source").agg(sum("c").as("n_s"))
    // pooled totals + tie term from the per-value counts
    val grand2 = all.agg(sum("c_all").as("n_all"),
      sum(col("c_all") * col("c_all") * col("c_all") - col("c_all"))
        .as("ties"))
    val cRestBelow = (col("cum_all") - col("c_all")) -
      (col("cum_s") - col("c"))
    val cRest = col("c_all") - col("c")
    val u2 = cumS.join(all, Seq("v"))
      .groupBy("source")
      .agg(sum(col("c") * (lit(2L) * cRestBelow + cRest)).as("u2"))
    val nS = col("n_s").cast("double")
    val nR = (col("n_all") - col("n_s")).cast("double")
    val nAll = col("n_all").cast("double")
    val u = col("u2").cast("double") / lit(2.0)
    val sigma = sqrt(nS * nR / lit(12.0) *
      ((nAll + lit(1.0)) -
        col("ties").cast("double") / (nAll * (nAll - lit(1.0)))))
    u2.join(broadcast(totals), Seq("source"))
      .crossJoin(broadcast(grand2))
      .select(col("source"), col("n_s"),
        round(u, 6).as("u"),
        round(when(sigma > 0.0, (u - nS * nR / lit(2.0)) / sigma), 6)
          .as("z"))
      .orderBy("source")
  }

  /** Heaps'-law fit across sources: regress ln(distinct types) on
    * ln(total tokens) over the per-source points — the vocabulary-
    * growth exponent β (≈0.4–0.6 for natural text; β near 1 flags
    * near-random token streams, β near 0 template/boilerplate
    * corpora). Per-source (N, V) from one token pass; the |S|-point
    * fit is a scalar aggregate. */
  def heapsFit(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val sv = toks.groupBy("source")
      .agg(count(lit(1)).as("n_toks"), countDistinct("t").as("n_types"))
      .select(log(col("n_toks").cast("double")).as("x"),
        log(col("n_types").cast("double")).as("y"))
    val a = sv.agg(count(lit(1)).cast("double").as("k"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val dxx = col("k") * col("sxx") - col("sx") * col("sx")
    val beta = (col("k") * col("sxy") - col("sx") * col("sy")) / dxx
    val r = (col("k") * col("sxy") - col("sx") * col("sy")) /
      (sqrt(dxx) * sqrt(col("k") * col("syy") - col("sy") * col("sy")))
    a.select(col("k").cast("long").as("n_sources"),
      round(beta, 6).as("beta"),
      round((col("sy") - beta * col("sx")) / col("k"), 6).as("ln_k"),
      round(r * r, 6).as("r2"))
  }

  /** Theil T inequality index of n_chars per source — the
    * entropy-based complement to [[Corpus.sourceGini]]: additively
    * decomposable, so per-source values roll up into a
    * between/within-source split. T = Σ(x·ln x)/Σx − ln(Σx/n), i.e.
    * three sufficient statistics per source (n, Σx exact BIGINTs,
    * Σ x·ln x double) from ONE pass — no sort, unlike Gini. */
  def theilBySource(docs: DataFrame, valueCol: String = "n_chars"): DataFrame = {
    val x = col(valueCol).cast("long")
    docs.filter(x > 0L).groupBy("source")
      .agg(count(lit(1)).as("n"), sum(x).as("sx"),
        sum(x.cast("double") * log(x.cast("double"))).as("_sxlx"))
      .select(col("source"), col("n"),
        round(col("_sxlx") / col("sx").cast("double") -
          log(col("sx").cast("double") / col("n").cast("double")), 6)
          .as("theil"))
      .orderBy("source")
  }

  /** Jensen–Shannon divergence of each source's term distribution from
    * the corpus-wide distribution — the bounded, symmetric sibling of
    * [[Corpus.sourceKl]] (0 ≤ JSD ≤ ln 2), the usual drift score when
    * sources can have disjoint vocabulary (KL would be ∞; JSD is not).
    * JSD = ½KL(P‖M) + ½KL(Q‖M) with M = ½(P+Q). Terms absent from the
    * source contribute exactly q·ln 2 to KL(Q‖M), so the whole sum
    * needs only the SOURCE's terms: KL(Q‖M) = Σ_{t∈src} q·ln(q/m) +
    * ln 2·(1 − Σ_{t∈src} q). Same (source, term) shuffle + broadcast
    * marginals shape as sourceKl — nothing scales with the vocabulary
    * beyond the one count pass. */
  def jsdBySource(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val st = toks.groupBy("source", "term").agg(count(lit(1)).as("c_st"))
    val sTot = st.groupBy("source").agg(sum("c_st").as("n_s"))
    val ct = st.groupBy("term").agg(sum("c_st").as("c_t"))
    val cTot = ct.agg(sum("c_t").cast("double").as("n"))
    val p = col("c_st").cast("double") / col("n_s")
    val q = col("c_t").cast("double") / col("n")
    val m = (p + q) / lit(2.0)
    val ln2 = log(lit(2.0))
    st.join(sTot, Seq("source"))
      .join(broadcast(ct), Seq("term"))
      .crossJoin(broadcast(cTot))
      .groupBy("source")
      .agg(sum(p * log(p / m)).as("_a"),
        sum(q * log(q / m)).as("_b"), sum(q).as("_cq"))
      .select(col("source"),
        round(lit(0.5) * col("_a") +
          lit(0.5) * (col("_b") + ln2 * (lit(1.0) - col("_cq"))), 6)
          .as("jsd"))
      .orderBy("source")
  }

  /** Per-document token Shannon entropy (nats) and its ln(types)-
    * normalized form — the lexical-concentration quality signal that
    * separates natural prose from keyword stuffing and boilerplate.
    * Uses H = ln n − (Σ c·ln c)/n so one (doc, token) count shuffle
    * and one per-doc roll-up suffice; single-type docs get H = 0 and a
    * NULL normalized value (0/0). */
  def docEntropy(docs: DataFrame): DataFrame = {
    val tc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val h = log(col("n_toks").cast("double")) -
      col("_slc") / col("n_toks").cast("double")
    tc.groupBy("doc_id").agg(
        sum("c").as("n_toks"), count(lit(1)).as("n_types"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("_slc"))
      .select(col("doc_id"), col("n_toks"), col("n_types"),
        round(h, 6).as("h"),
        round(when(col("n_types") > 1L,
          h / log(col("n_types").cast("double"))), 6).as("h_norm"))
  }

  /** Per-source lexical-richness profile from ONE (source, term) count
    * pass: type count, hapax ratio (fraction of types seen exactly
    * once — the classic vocabulary-freshness signal; near 0 flags
    * template/duplicated text), Yule's K = 10⁴·(Σc² − N)/N² (repeat-
    * rate concentration, length-robust unlike raw TTR), and Simpson's
    * repeat probability Σc(c−1)/(N(N−1)). All four are closed forms
    * over exact BIGINT sufficient statistics (N, types, hapax, Σc²),
    * so the cost at any scale is the one token-count shuffle the other
    * vocabulary operators already pay. */
  def lexicalProfile(docs: DataFrame): DataFrame = {
    val st = docs.select(col("source"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
      .groupBy("source", "t").agg(count(lit(1)).as("c"))
    val n = col("n_toks").cast("double")
    st.groupBy("source").agg(
        sum("c").as("n_toks"), count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"),
        sum(col("c") * col("c")).as("_scc"))
      .select(col("source"), col("n_toks"), col("n_types"),
        round(col("hapax").cast("double") /
          col("n_types").cast("double"), 6).as("hapax_ratio"),
        round(lit(1.0e4) * (col("_scc") - col("n_toks")).cast("double") /
          (n * n), 6).as("yule_k"),
        round(when(col("n_toks") > 1L,
          (col("_scc") - col("n_toks")).cast("double") /
            (n * (n - lit(1.0)))), 6).as("simpson"))
      .orderBy("source")
  }

  /** Per-source Flesch reading-ease from exact per-doc regex counts:
    * words = nonspace runs, sentences = [.!?]+ runs clamped to ≥1 per
    * doc (corpora stripped of punctuation — like this synthetic one —
    * degrade to one sentence per doc instead of dividing by zero),
    * syllables = [aeiouy]+ vowel-group runs (the standard heuristic;
    * whole-text count, no per-word 1-syllable floor). FRE = 206.835 −
    * 1.015·(W/S) − 84.6·(Y/W) over the per-source BIGINT sums — one
    * map-side-combined pass, three integers of state per source. */
  def readability(docs: DataFrame): DataFrame = {
    val per = docs.select(col("source"),
      regexp_count(col("text"), lit("[^ ]+")).cast("long").as("w"),
      greatest(regexp_count(col("text"), lit("[.!?]+")).cast("long"),
        lit(1L)).as("s"),
      regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
        .as("y"))
    per.groupBy("source")
      .agg(sum("w").as("words"), sum("s").as("sentences"),
        sum("y").as("syllables"))
      .select(col("source"), col("words"), col("sentences"),
        col("syllables"),
        round(lit(206.835) -
          lit(1.015) * col("words").cast("double") /
            col("sentences").cast("double") -
          lit(84.6) * col("syllables").cast("double") /
            col("words").cast("double"), 4).as("flesch"))
      .orderBy("source")
  }

  /** One-way ANOVA F across sources on an integer column (default
    * n_chars) — the parametric k-group sibling of [[welchT]]: does mean
    * document length differ between sources more than within them?
    * Per-source sufficient statistics (n, Σx, Σx² — exact BIGINTs) from
    * ONE map-side-combined pass; SS_between = Σ(Σx_s)²/n_s − (Σx)²/N
    * and SS_within = Σx² − Σ(Σx_s)²/n_s are closed-form over the k
    * aggregated rows. NULL F when k < 2 or SS_within = 0. */
  def anovaF(docs: DataFrame, valueCol: String = "n_chars"): DataFrame = {
    val x = col(valueCol).cast("long")
    val s = docs.groupBy("source").agg(
      count(lit(1)).as("n_s"), sum(x).as("sx_s"),
      sumSq(x, x).as("sxx_s"))
    val a = s.agg(count(lit(1)).as("k"), sum("n_s").as("n"),
      sum("sx_s").as("sx"), sum("sxx_s").as("sxx"),
      sum(col("sx_s").cast("double") * col("sx_s").cast("double") /
        col("n_s").cast("double")).as("sb"))
    val ssb = col("sb") -
      col("sx").cast("double") * col("sx").cast("double") /
        col("n").cast("double")
    val ssw = col("sxx").cast("double") - col("sb")
    a.select(col("k"), col("n"),
      round(ssb, 4).as("ss_between"), round(ssw, 4).as("ss_within"),
      round(when(col("k") > 1L && ssw > 0.0,
        (ssb / (col("k") - lit(1L)).cast("double")) /
          (ssw / (col("n") - col("k")).cast("double"))), 6).as("f"))
  }

  /** Kruskal–Wallis H across sources over an integer column — the
    * rank-based (distribution-free) counterpart of [[anovaF]], with the
    * standard tie correction. Built on the same (value, source) count
    * frame as [[mannWhitneyBySource]]: the average rank of a tied value
    * block is carried as the EXACT half-unit integer 2r(v) =
    * 2·cum_below + c_all + 1, so each source's rank sum 2R_s = Σ c_sv ·
    * 2r(v) is exact BIGINT; H touches doubles only at the final closed
    * form. All windows run over the value domain, never the corpus. */
  def kruskalWallis(docs: DataFrame,
                    valueCol: String = "n_chars"): DataFrame = {
    val cnt = docs
      .groupBy(col(valueCol).cast("long").as("v"), col("source"))
      .agg(count(lit(1)).as("c"))
    val all = cnt.groupBy("v").agg(sum("c").as("c_all"))
      .withColumn("cum_all", sum("c_all").over(Window.orderBy("v")))
    val grand = all.agg(sum("c_all").as("n_all"),
      sum(col("c_all") * col("c_all") * col("c_all") - col("c_all"))
        .as("ties"))
    // 2·avgrank(v): ranks are 1-based over the pooled order
    val rank2 = lit(2L) * (col("cum_all") - col("c_all")) +
      col("c_all") + lit(1L)
    val rs = cnt.join(all, Seq("v"))
      .groupBy("source")
      .agg(sum("c").as("n_s"), sum(col("c") * rank2).as("r2_s"))
    val nAll = col("n_all").cast("double")
    val h = lit(12.0) / (nAll * (nAll + lit(1.0))) * col("_srr") -
      lit(3.0) * (nAll + lit(1.0))
    val corr = lit(1.0) - col("ties").cast("double") /
      (nAll * nAll * nAll - nAll)
    rs.agg(count(lit(1)).as("k"),
        sum(col("r2_s").cast("double") * col("r2_s").cast("double") /
          (lit(4.0) * col("n_s").cast("double"))).as("_srr"))
      .crossJoin(broadcast(grand))
      .select(col("k"), col("n_all").as("n"), round(h, 6).as("h"),
        round(when(corr > 0.0, h / corr), 6).as("h_corrected"))
  }

  /** Spearman rank correlation between n_chars and whitespace token
    * count over the corpus — the monotone-association check that
    * Pearson ([[featureCorr]]) misses under nonlinearity or heavy
    * tails. Average ranks with ties are carried as exact half-unit
    * integers (2·rank, same trick as [[kruskalWallis]]) computed on
    * the per-VALUE count frames, then joined back to the doc features;
    * ρ is Pearson over the integer rank pairs, affine-invariant so the
    * 2× scale cancels. Each 2·rank is cast DECIMAL(18,0) (exact to
    * N ≈ 5·10¹⁷), so the rank PRODUCTS are DECIMAL(37,0) and their
    * sums accumulate as DECIMAL(38,0) — exact to N ≈ 10¹², where
    * BIGINT Σ(2r)² would overflow past N ≈ 10⁶. */
  def spearman(docs: DataFrame): DataFrame = {
    val f = docFeatures(docs).select("nc", "nt")
    def rank2(colName: String, out: String): DataFrame = {
      val cnt = f.groupBy(col(colName).as("v")).agg(count(lit(1)).as("c"))
      cnt.withColumn("cum", sum("c").over(Window.orderBy("v")))
        .select(col("v").as(colName),
          (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L))
            .cast("decimal(18,0)").as(out))
    }
    val ranked = f.join(rank2("nc", "rx"), Seq("nc"))
      .join(rank2("nt", "ry"), Seq("nt"))
    val a = ranked.agg(count(lit(1)).as("n"),
      sum("rx").as("sx"), sum("ry").as("sy"),
      sum(col("rx") * col("rx")).as("sxx"),
      sum(col("ry") * col("ry")).as("syy"),
      sum(col("rx") * col("ry")).as("sxy"))
    val n = col("n").cast("double")
    def d(c: Column) = c.cast("double")
    a.select(col("n"),
      round((n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
        (sqrt(n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
          sqrt(n * d(col("syy")) - d(col("sy")) * d(col("sy")))), 6)
        .as("rho"))
  }

  /** Population Stability Index per source (the standard ML-monitoring
    * drift metric): n_chars is bucketed into corpus-level deciles (the
    * half-unit value-domain rank rule — ties share a bucket, no corpus
    * sort), and each source's bucket distribution is scored against
    * the corpus with PSI = Σ (p−q)·ln(p/q); empty source-buckets
    * contribute 0 (documented convention — no epsilon smoothing, so
    * both engines agree exactly). Rule of thumb: <0.1 stable, >0.25
    * drifted. Returns (source, n_docs, buckets_hit, psi).
    *
    * Scale: one (value, count) frame for the decile map (bounded by
    * the value domain), one (source, decile) count shuffle, closed
    * forms on the |S|·10 frame. */
  def psiBySource(docs: DataFrame): DataFrame = {
    val vc = docs.groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.orderBy("v")
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val dec = vc.withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(all))
      .select(col("v"),
        least(floor((lit(2L) * (col("cum") - col("c")) + col("c"))
            .cast("double") / (lit(2L) * col("n")).cast("double") * lit(10.0)),
          lit(9.0)).cast("long").as("decile"))
    val sd = docs.select(col("source"), col("n_chars").as("v"))
      .join(dec, Seq("v"))
      .groupBy("source", "decile").agg(count(lit(1)).as("c"))
    val bySrc = sd.groupBy("source").agg(sum("c").as("ns"))
    val byDec = sd.groupBy("decile").agg(sum("c").as("cd"))
    val tot = byDec.agg(sum("cd").as("n"))
    sd.join(broadcast(bySrc), Seq("source"))
      .join(broadcast(byDec), Seq("decile"))
      .crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(max("ns").cast("long").as("n_docs"),
        count(lit(1)).cast("long").as("buckets_hit"),
        sum((col("c") / col("ns") - col("cd") / col("n")) *
          log((col("c") / col("ns")) / (col("cd") / col("n")))).as("psi0"))
      .select(col("source"), col("n_docs"), col("buckets_hit"),
        round(col("psi0"), 6).as("psi"))
      .orderBy("source")
  }

  /** Hash-sampling bias audit: Pearson χ² between the deterministic
    * 10% hash sample's source distribution and the full corpus — the
    * "is my cheap sample actually representative" gate run before any
    * sampled-data decision is trusted. Expected counts e_s = n_s·f
    * where f is the realized global sampling fraction, so the test is
    * exact-count-driven with one double division chain at the end.
    * Returns one row (n_docs, n_sampled, df, chi2).
    *
    * Scale: two |S|-row aggregates off one scan (the sample flag is a
    * codegen'd hash map) — no second pass, no shuffle wider than |S|. */
  def sampleBias(docs: DataFrame, pct: Int = 10): DataFrame = {
    val flagged = docs.select(col("source"),
      when(pmod(TextOps.hash60(col("doc_id").cast("string"), "s:"),
        lit(100L)) < pct, 1L).otherwise(0L).as("s"))
    val perSrc = flagged.groupBy("source")
      .agg(count(lit(1)).as("ns"), sum("s").as("os"))
    val tot = perSrc.agg(sum("ns").as("n"), sum("os").as("m"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("ns"), col("os"), col("n"), col("m"),
        (col("ns").cast("double") * col("m").cast("double") /
          col("n").cast("double")).as("e"))
      .agg(max("n").cast("long").as("n_docs"),
        max("m").cast("long").as("n_sampled"),
        (count(lit(1)) - 1).cast("long").as("df"),
        round(sum((col("os").cast("double") - col("e")) *
          (col("os").cast("double") - col("e")) / col("e")), 6).as("chi2"))
  }

  /** Burrows's Delta stylometric distance between sources (Burrows
    * 2002, the authorship-attribution standard): over the corpus
    * top-k terms, each source's relative frequency is z-scored across
    * sources and Delta(a,b) = mean |z_a − z_b|. High Delta = distinct
    * registers worth separate mixing weights; near-zero = one style
    * masquerading as two sources. The μ term cancels in z_a − z_b, so
    * the computation reduces to |f_a − f_b|/σ_t — frequencies are
    * integerized to 1e-9 units (floor(1e9·c/n + 0.5), exact in both
    * engines) and σ_t comes from exact BIGINT/DECIMAL sufficient
    * statistics; σ_t = 0 terms (identical frequency everywhere)
    * contribute 0. Returns (source_a, source_b, k_used, delta), a<b.
    *
    * Scale: (source, term) counts shuffle once; the top-k term list is
    * a driver-sized TakeOrdered; the z-grid is |S|·k rows and the pair
    * frame |S|²·k — broadcast-sized regardless of corpus size. */
  def burrowsDelta(docs: DataFrame, k: Int = 40): DataFrame = {
    val tc = docs.select(col("source"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val cnt = tc.groupBy("source", "term").agg(count(lit(1)).as("c"))
    val totals = cnt.groupBy("source").agg(sum("c").as("n"))
    val top = cnt.groupBy("term").agg(sum("c").as("ct"))
      .orderBy(col("ct").desc, col("term").asc).limit(k)
      .select("term").localCheckpoint()
    // absent (source, term) pairs ARE rows (f = 0): a term one source
    // never uses is maximal style signal, not missing data
    val grid = totals.crossJoin(broadcast(top))
      .join(cnt, Seq("source", "term"), "left")
      .select(col("source"), col("term"),
        floor(lit(1e9) * coalesce(col("c"), lit(0L)).cast("double") /
          col("n").cast("double") + lit(0.5)).cast("long").as("fi"))
    val sd = grid.groupBy("term").agg(count(lit(1)).as("m"),
        sum("fi").as("sf"),
        sum(col("fi").cast("decimal(38,0)") * col("fi").cast("decimal(38,0)"))
          .as("sff"))
      .select(col("term"),
        sqrt(col("sff").cast("double") / col("m").cast("double") -
          (col("sf").cast("double") / col("m").cast("double")) *
          (col("sf").cast("double") / col("m").cast("double"))).as("sigma"))
    grid.join(grid.select(col("source").as("source_b"), col("term"),
        col("fi").as("fi_b")), Seq("term"))
      .filter(col("source") < col("source_b"))
      .join(broadcast(sd), Seq("term"))
      .groupBy(col("source").as("source_a"), col("source_b"))
      .agg(count(lit(1)).cast("long").as("k_used"),
        sum(when(col("sigma") > 0.0,
          abs(col("fi") - col("fi_b")).cast("double") / col("sigma"))
          .otherwise(0.0)).as("dsum"))
      .select(col("source_a"), col("source_b"), col("k_used"),
        round(col("dsum") / col("k_used").cast("double"), 6).as("delta"))
      .orderBy("source_a", "source_b")
  }

  /** Cohen's d (pooled-SD standardized mean difference) between all
    * source pairs over an integer column, with the Hedges' g
    * small-sample correction — the effect-size companion to
    * [[welchT]]: t says "statistically different", d says "by how
    * much, in SD units". Same sufficient-statistics shape: one
    * corpus pass for (n, Σx, Σx²) per source, then an |S|²-bounded
    * broadcast pair join of closed forms. */
  def cohensD(docs: DataFrame, valueCol: String = "n_chars"): DataFrame = {
    val x = col(valueCol).cast("long")
    val s = docs.groupBy("source").agg(
      count(lit(1)).as("n"), sum(x).as("sx"), sumSq(x, x).as("sxx"))
    def side(tag: String): DataFrame =
      s.select(col("source").as(s"src_$tag"), col("n").as(s"n_$tag"),
        (col("sx").cast("double") / col("n")).as(s"m_$tag"),
        when(col("n") >= 2,
          (col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") /
              col("n").cast("double")) / (col("n") - 1).cast("double"))
          .as(s"v_$tag"))
    val nT = (col("n_a") + col("n_b")).cast("double")
    val pooled = ((col("n_a") - 1).cast("double") * col("v_a") +
      (col("n_b") - 1).cast("double") * col("v_b")) / (nT - 2.0)
    val d = (col("m_a") - col("m_b")) / sqrt(pooled)
    side("a").join(broadcast(side("b")), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        round(when(col("n_a") + col("n_b") > 2 && pooled > 0.0, d), 6)
          .as("d"),
        round(when(col("n_a") + col("n_b") > 2 && pooled > 0.0,
          d * (lit(1.0) - lit(3.0) / (lit(4.0) * nT - 9.0))), 6).as("g"))
      .orderBy("src_a", "src_b")
  }

  /** Cliff's delta per source vs the rest of the corpus — the
    * ordinal (distribution-free) effect size that pairs with
    * [[mannWhitneyBySource]]'s z: δ = P(x_s > x_r) − P(x_s < x_r) =
    * 2U/(n_s·n_r) − 1, computed from the SAME exact half-unit 2U
    * accumulation; the Romano et al. 2006 magnitude band is read off
    * the 6dp-rounded δ so both engines band identically. */
  def cliffsDelta(docs: DataFrame,
                  valueCol: String = "n_chars"): DataFrame = {
    val cnt = docs
      .groupBy(col(valueCol).cast("long").as("v"), col("source"))
      .agg(count(lit(1)).as("c"))
    val all = cnt.groupBy("v").agg(sum("c").as("c_all"))
      .withColumn("cum_all", sum("c_all").over(Window.orderBy("v")))
    val cumS = cnt.withColumn("cum_s",
      sum("c").over(Window.partitionBy("source").orderBy("v")))
    val totals = cnt.groupBy("source").agg(sum("c").as("n_s"))
    val grand = all.agg(sum("c_all").as("n_all"))
    val cRestBelow = (col("cum_all") - col("c_all")) -
      (col("cum_s") - col("c"))
    val cRest = col("c_all") - col("c")
    val u2 = cumS.join(all, Seq("v"))
      .groupBy("source")
      .agg(sum(col("c") * (lit(2L) * cRestBelow + cRest)).as("u2"))
    val nS = col("n_s").cast("double")
    val nR = (col("n_all") - col("n_s")).cast("double")
    val deltaR = round(col("u2").cast("double") / (nS * nR) - lit(1.0), 6)
    u2.join(broadcast(totals), Seq("source"))
      .crossJoin(broadcast(grand))
      .select(col("source"), col("n_s"), deltaR.as("delta"),
        when(abs(deltaR) < 0.147, "negligible")
          .when(abs(deltaR) < 0.33, "small")
          .when(abs(deltaR) < 0.474, "medium")
          .otherwise("large").as("magnitude"))
      .orderBy("source")
  }

  /** Brown–Forsythe test (Levene with medians — Brown & Forsythe
    * 1974): one-way ANOVA on z = |x − median_source|, the robust
    * variance-homogeneity check that decides whether [[anovaF]]'s
    * equal-variance assumption holds across sources. The per-source
    * median is picked as EXACT half-unit integers off the (value,
    * source) count frame (tie-averaged order statistics located by
    * cumulative range, windows partitioned by source), so z doubles
    * are really integers /2 and the sufficient statistics accumulate
    * exactly: Σ(2z) in BIGINT, Σ(2z)² in DECIMAL via [[sumSq]]. */
  def brownForsythe(docs: DataFrame,
                    valueCol: String = "n_chars"): DataFrame = {
    val cnt = docs
      .groupBy(col(valueCol).cast("long").as("v"), col("source"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(
        Window.partitionBy("source").orderBy("v")))
    val totals = cnt.groupBy("source").agg(sum("c").as("n_s"))
    val withN = cnt.join(broadcast(totals), Seq("source"))
    val r1 = floor((col("n_s") + 1) / 2)
    val r2 = floor((col("n_s") + 2) / 2)
    val m2 = withN.groupBy("source")
      .agg((sum(when(col("cum") - col("c") < r1 && r1 <= col("cum"),
        col("v")).otherwise(0L)) +
        sum(when(col("cum") - col("c") < r2 && r2 <= col("cum"),
          col("v")).otherwise(0L))).as("m2"))
    // z2 = 2·|x − median| — exact integers (half units folded out)
    val z2 = abs(col(valueCol).cast("long") * 2 - col("m2"))
    val zdocs = docs.select(col("source"), col(valueCol))
      .join(broadcast(m2), Seq("source"))
      .select(col("source"), z2.as("z2"))
    val g = zdocs.groupBy("source").agg(count(lit(1)).as("n_g"),
      sum("z2").as("sz"), sumSq(col("z2"), col("z2")).as("szz"))
    val a = g.agg(count(lit(1)).as("k"), sum("n_g").as("n"),
      sum("sz").as("sz"), sum("szz").as("szz"),
      sum(col("sz").cast("double") * col("sz").cast("double") /
        col("n_g").cast("double")).as("sb"))
    val ssb = col("sb") -
      col("sz").cast("double") * col("sz").cast("double") /
        col("n").cast("double")
    val ssw = col("szz").cast("double") - col("sb")
    a.select(col("k"), col("n"),
      round(when(col("k") > 1L && ssw > 0.0,
        (ssb / (col("k") - lit(1L)).cast("double")) /
          (ssw / (col("n") - col("k")).cast("double"))), 6).as("w"))
  }

  /** Jarque–Bera normality screen per source: sample skewness g₁,
    * excess kurtosis g₂ and JB = n/6·(g₁² + g₂²/4) from the first
    * four raw power sums — one corpus pass, exact accumulation (Σx
    * BIGINT; Σx², Σx³, Σx⁴ per-row exact longs cast to DECIMAL(38,0)
    * before summing — x⁴ ≤ 6.25e14 for 10⁴-char docs, the sums exact
    * to ~10³⁸; the DuckDB mirror rides HUGEINT). Central moments by
    * the standard raw→central expansion, mirrored term-for-term. */
  def jarqueBera(docs: DataFrame,
                 valueCol: String = "n_chars"): DataFrame = {
    val x = col(valueCol).cast("long")
    val x2 = x * x; val x3 = x2 * x; val x4 = x2 * x2
    val s = docs.groupBy("source").agg(count(lit(1)).as("n"),
      sum(x).as("s1"), sum(x2.cast("decimal(38,0)")).as("s2"),
      sum(x3.cast("decimal(38,0)")).as("s3"),
      sum(x4.cast("decimal(38,0)")).as("s4"))
    val m = s.select(col("source"), col("n"),
      (col("s1").cast("double") / col("n")).as("mu"),
      (col("s2").cast("double") / col("n")).as("r2"),
      (col("s3").cast("double") / col("n")).as("r3"),
      (col("s4").cast("double") / col("n")).as("r4"))
    val c = m.select(col("source"), col("n"), col("mu"),
      (col("r2") - col("mu") * col("mu")).as("m2"),
      (col("r3") - lit(3.0) * col("mu") * col("r2") +
        lit(2.0) * col("mu") * col("mu") * col("mu")).as("m3"),
      (col("r4") - lit(4.0) * col("mu") * col("r3") +
        lit(6.0) * col("mu") * col("mu") * col("r2") -
        lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu")).as("m4"))
    val skew = col("m3") / (col("m2") * sqrt(col("m2")))
    val kurt = col("m4") / (col("m2") * col("m2")) - lit(3.0)
    c.select(col("source"), col("n"),
        round(when(col("m2") > 0.0, skew), 6).as("skewness"),
        round(when(col("m2") > 0.0, kurt), 6).as("kurtosis"),
        round(when(col("m2") > 0.0,
          col("n").cast("double") / lit(6.0) *
            (skew * skew + kurt * kurt / lit(4.0))), 6).as("jb"))
      .orderBy("source")
  }

  /** Poisson(1) inverse-CDF thresholds (cumulative e⁻¹·Σ 1/k!): the
    * weight of a doc in resample b is the k whose cumulative bucket
    * holds u — the standard Poisson-bootstrap weight draw, capped at 7
    * (P ≈ 1e-5 truncated; documented). Written as exact decimal
    * literals so both engines compare the same constants. */
  val poissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428846, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)

  /** Deterministic Poisson-bootstrap confidence interval for the
    * per-source mean document length (Oza–Russell / Chamandy et al.:
    * the bootstrap that works in one pass over distributed data —
    * resample b gives every doc an independent Poisson(1) multiplicity
    * instead of drawing n-of-n): B resamples whose weights come from
    * the salted hash u_b(doc) = (hash60("bs<b>:"++doc_id)+½)/2⁶⁰
    * through [[poissonCdf]] — fully deterministic, so the DuckDB
    * oracle replays every weight exactly. Reports the point mean and
    * the 2nd-smallest / 2nd-largest of the NON-NULL resample means
    * (the ~94% CI at B = 32), ties broken by resample index. A den = 0
    * resample (possible only for tiny sources, P ≈ e⁻ⁿ) is genuinely
    * excluded: the high pick ranks against the non-null count, so a
    * degenerate resample narrows nothing silently, and with fewer than
    * 3 usable resamples the bound is an explicit NULL.
    *
    * Scale: ONE corpus pass with B weight columns folded into a
    * map-side-combined per-source aggregate (exact BIGINT Σw·x and
    * Σw); the unpivot + order statistics run on the |S|·B-row frame.
    * Each resample mean is ONE division of exact integers — no
    * summation-order doubles anywhere. */
  def bootstrapMeanCi(docs: DataFrame, valueCol: String = "n_chars",
                      b: Int = 32): DataFrame = {
    require(b >= 4, "bootstrapMeanCi needs at least 4 resamples")
    val x = col(valueCol).cast("long")
    def weight(i: Int) = {
      val u = (TextOps.hash60(col("doc_id").cast("string"), s"bs$i:")
        .cast("double") + lit(0.5)) / lit((1L << 60).toDouble)
      poissonCdf.zipWithIndex.foldRight(lit(poissonCdf.length.toLong)) {
        case ((c, k), elseCol) => when(u < c, lit(k.toLong)).otherwise(elseCol)
      }
    }
    val aggs = Seq(count(lit(1)).cast("long").as("n_docs"),
      sum(x).cast("long").as("sx")) ++
      (0 until b).flatMap(i => Seq(
        sum(weight(i) * x).cast("long").as(s"num_$i"),
        sum(weight(i)).cast("long").as(s"den_$i")))
    val per = docs.groupBy("source").agg(aggs.head, aggs.tail: _*)
    // unpivot the B resample means; den = 0 (possible only for tiny
    // groups) yields NULL and sorts last — excluded by the rank picks
    val stacked = per.select(col("source"), col("n_docs"), col("sx"),
      expr("stack(" + b + ", " + (0 until b).map(i =>
        s"CAST($i AS BIGINT), num_$i, den_$i").mkString(", ") +
        ") as (rb, num, den)"))
      .select(col("source"), col("n_docs"), col("sx"), col("rb"),
        when(col("den") > 0,
          round(col("num").cast("double") / col("den").cast("double"), 6))
          .as("mean_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("mean_b").asc_nulls_last, col("rb").asc)
    // NULLs sort last, so non-null means occupy rn 1..nn: the 2nd-largest
    // NON-NULL is rn = nn - 1, not rn = b - 1 (which with one den = 0
    // resample would silently hand boot_hi the largest mean instead)
    val wp = org.apache.spark.sql.expressions.Window.partitionBy("source")
    stacked.withColumn("rn", row_number().over(w))
      .withColumn("nn", count(col("mean_b")).over(wp))
      .groupBy("source")
      .agg(max("n_docs").as("n_docs"),
        round(max(col("sx")).cast("double") /
          max(col("n_docs")).cast("double"), 6).as("mean"),
        max(when(col("rn") === 2, col("mean_b"))).as("boot_lo"),
        max(when(col("rn") === col("nn") - 1, col("mean_b"))).as("boot_hi"),
        count(when(col("mean_b").isNotNull, 1)).cast("long").as("n_resamples"))
      .orderBy("source")
  }

  /** Cohen's κ (Cohen 1960) agreement between the corpus's two
    * independent document filters — the heuristic quality gate
    * (quality ≥ θ on the shared 6-dp score) and the Gopher composite
    * gate — "are my two filters redundant or complementary": κ = 1
    * means one filter is dead weight, κ ≈ 0 means they prune
    * independent slices (chance-corrected, unlike raw overlap).
    * NULL κ when pₑ = 1 (both filters constant). Returns one row
    * (n, n11, n10, n01, n00, po, pe, kappa).
    *
    * Scale: both gates are existing single-pass kernels; the join is
    * doc_id-keyed; the contingency table is 4 exact BIGINTs of
    * aggregate state — scan-bound at any corpus size. */
  def filterKappa(docs: DataFrame, theta: Double = 0.5): DataFrame = {
    val a = TextOps.quality(docs)
      .select(col("doc_id"), (col("quality") >= theta).cast("long").as("a"))
    val b = Corpus.gopherRules(docs)
      .select(col("doc_id"), col("keep").cast("long").as("b"))
    val ct = a.join(b, Seq("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("a") * col("b")).as("n11"),
        sum(col("a") * (lit(1L) - col("b"))).as("n10"),
        sum((lit(1L) - col("a")) * col("b")).as("n01"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
    val nD = col("n").cast("double")
    val po = (col("n11") + col("n00")).cast("double") / nD
    val pe = ((col("n11") + col("n10")).cast("double") *
      (col("n11") + col("n01")).cast("double") +
      (col("n01") + col("n00")).cast("double") *
        (col("n10") + col("n00")).cast("double")) / (nD * nD)
    ct.select(col("n").cast("long").as("n"),
      col("n11").cast("long").as("n11"),
      col("n10").cast("long").as("n10"),
      col("n01").cast("long").as("n01"),
      col("n00").cast("long").as("n00"),
      round(po, 6).as("po"),
      round(pe, 6).as("pe"),
      round(when(pe < 1.0, (po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  /** Expected-calibration-error table (Naeini et al. 2015; Guo et al.
    * 2017) for the heuristic quality score read as a keep-probability
    * against the Gopher gate's actual keep decision: ten equal-width
    * probability bins, per bin the mean score (confidence), the
    * empirical keep rate (accuracy) and their gap; `ece` = Σ
    * (nᵦ/N)·|accᵦ − confᵦ| repeated on every row. A well-calibrated
    * score hugs the diagonal; the table says WHERE the heuristic
    * over- or under-promises before anyone thresholds on it.
    *
    * Scale: both inputs are single-pass kernels; the rollup is a
    * ≤10-key hash aggregate; the ECE scalar broadcasts back. Returns
    * (bin, n_docs, conf, acc, gap, ece) ordered by bin. */
  def calibrationEce(docs: DataFrame): DataFrame = {
    val p = TextOps.quality(docs).select(col("doc_id"), col("quality"))
    val y = Corpus.gopherRules(docs)
      .select(col("doc_id"), col("keep").cast("long").as("y"))
    val b = p.join(y, Seq("doc_id"))
      .select(least(floor(col("quality") * 10.0), lit(9.0)).cast("long")
        .as("bin"), col("quality"), col("y"))
    val per = b.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("quality").as("sq"),
        sum("y").as("sy"))
      .localCheckpoint() // ≤ 10 rows
    val conf = col("sq") / col("n_docs").cast("double")
    val acc = col("sy").cast("double") / col("n_docs").cast("double")
    val ece = per.crossJoin(broadcast(per.agg(
        sum("n_docs").cast("double").as("nn"))))
      .agg(sum((col("n_docs").cast("double") / col("nn")) *
        abs(col("sy").cast("double") / col("n_docs").cast("double") -
          col("sq") / col("n_docs").cast("double"))).as("ece"))
    per.crossJoin(broadcast(ece))
      .select(col("bin"), col("n_docs").cast("long").as("n_docs"),
        round(conf, 6).as("conf"), round(acc, 6).as("acc"),
        round(abs(acc - conf), 6).as("gap"),
        round(col("ece"), 6).as("ece"))
      .orderBy("bin")
  }
}
