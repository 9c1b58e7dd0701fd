package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust / rank-based corpus statistics — the round-10 wave of
  * distribution tooling a mix designer reaches for when means lie:
  * quantile normalization (cross-source comparable quality), median +
  * MAD outlier screens (heavy tails don't move a median), trimmed
  * means, and Neyman sampling allocation (variance-aware stratified
  * budgets).
  *
  * Reference scope note: rs-graphdb's aggregate surface stops at
  * percentile_cont/stdev (`src/query.rs:534/586`); this module is part
  * of the brief-mandated training-pipeline extension.
  *
  * Scale shape shared by every operator here: ONE (source, value)
  * count shuffle over an integer (or 6dp-stable) value column, then
  * windows over the VALUE DOMAIN — bounded by distinct values, never
  * the corpus — and closed forms on |S|-row aggregate frames. The same
  * exact-arithmetic discipline as [[Stats]]: ranks as half-unit
  * integers, sums as BIGINT/DECIMAL(38,0), doubles only at output. */
object Robust {

  /** Per-doc quantile (percent-rank) normalization of the quality
    * score WITHIN its source: pct = (2·cum_below + c) / (2·n_s) — the
    * tie-averaged (rank − 0.5)/n map onto (0, 1), making quality
    * thresholds comparable across sources whose raw score
    * distributions differ (the cross-source calibration step before a
    * single global quality gate). Exact: ranks are half-unit integers
    * off the per-(source, value) count frame; the division happens
    * once at output. Windows run over the value domain per source. */
  def quantileNorm(docs: DataFrame): DataFrame = {
    val scored = TextOps.quality(docs)
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    val cnt = scored.groupBy(col("source"), col("quality").as("q"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("source").orderBy("q")
    val ranked = cnt
      .withColumn("cum", sum("c").over(w))
      .withColumn("n_s", sum("c").over(Window.partitionBy("source")))
      .select(col("source"), col("q"),
        round((lit(2L) * (col("cum") - col("c")) + col("c")).cast("double") /
          (lit(2L) * col("n_s")).cast("double"), 6).as("pct"))
    scored.select(col("doc_id"), col("source"), col("quality").as("q"))
      .join(ranked, Seq("source", "q"))
      .select(col("doc_id"), col("source"), col("q"), col("pct"))
  }

  /** Neyman allocation for a stratified sample of `total` docs across
    * sources: n_s ∝ N_s·σ_s (σ = sample stddev of n_chars — strata
    * with more internal variance get more budget, the optimal
    * allocation for estimating the corpus mean). One
    * sufficient-statistics pass (n, Σx BIGINT, Σx² DECIMAL(38,0) per
    * source), closed forms on the |S|-row frame; the actual draw rides
    * the deterministic hash sampler with these quotas. Degenerate
    * strata (n < 2 or zero variance) get σ = 0 and only the floor
    * allocation from the share formula. */
  def neymanAllocation(docs: DataFrame, total: Long = 1000L): DataFrame = {
    val x = col("n_chars").cast("long")
    val s = docs.groupBy("source").agg(
      count(lit(1)).as("n"), sum(x).as("sx"),
      // cast BEFORE the multiply: the product itself overflows int64
      // past values of ~3e9 (same discipline as Stats.sumSq)
      sum(x.cast("decimal(19,0)") * x.cast("decimal(19,0)")).as("sxx"))
    val variance = when(col("n") >= 2,
      greatest((col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") /
          col("n").cast("double")) / (col("n") - 1).cast("double"), lit(0.0)))
      .otherwise(lit(0.0))
    val weighted = s.select(col("source"), col("n"),
      (col("n").cast("double") * sqrt(variance)).as("w"))
    val tot = weighted.agg(sum("w").as("wt"))
    weighted.crossJoin(broadcast(tot))
      .select(col("source"), col("n").as("n_docs"),
        round(col("w") / col("n").cast("double"), 6).as("sigma"),
        round(when(col("wt") > 0.0, col("w") / col("wt")), 6).as("share"),
        when(col("wt") > 0.0,
          floor(col("w") / col("wt") * lit(total.toDouble) + lit(0.5))
            .cast("long")).as("n_alloc"))
      .orderBy("source")
  }

  /** Per-source median + MAD (median absolute deviation) outlier
    * screen over an integer column: med = lower median (smallest v
    * with 2·cum ≥ n + 1), MAD = lower median of |x − med| (integer
    * again, so the second median is exact too), outliers = docs with
    * |x − med| > k·MAD. Heavy-tailed length distributions don't move
    * a median the way they drag a mean — this is the robust twin of
    * the z-score screen. Two (source, value)-domain passes (the
    * deviation values are re-counted, not re-scanned: the deviation
    * count frame derives from the FIRST count frame), windows over
    * the value domain only. */
  def madOutliers(docs: DataFrame, valueCol: String = "n_chars",
                  k: Int = 3): DataFrame = {
    val cnt = docs.groupBy(col("source"), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val w = Window.partitionBy("source").orderBy("v")
    def lowerMedian(counted: DataFrame, out: String): DataFrame =
      counted
        .withColumn("cum", sum("c").over(w))
        .withColumn("n_s", sum("c").over(Window.partitionBy("source")))
        .filter(lit(2L) * col("cum") >= col("n_s") + 1L)
        .groupBy("source").agg(min("v").as(out))
    val med = lowerMedian(cnt, "med")
    val dev = cnt.join(broadcast(med), Seq("source"))
      .groupBy(col("source"), abs(col("v") - col("med")).as("v"))
      .agg(sum("c").as("c"))
    val mad = lowerMedian(dev, "mad")
    val stats = broadcast(med.join(mad, Seq("source")))
    // outlier tally off the COUNT frame — the corpus is scanned once
    // total (for cnt); everything after runs on the value domain
    cnt.join(stats, Seq("source"))
      .groupBy("source")
      .agg(sum("c").as("n_docs"), first("med").as("median"),
        first("mad").as("mad"),
        sum(when(abs(col("v") - col("med")) > lit(k.toLong) * col("mad"),
          col("c")).otherwise(0L)).as("n_outliers"))
      .select(col("source"), col("n_docs"), col("median"), col("mad"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n_docs").cast("double"),
          6).as("outlier_rate"))
      .orderBy("source")
  }

  /** Per-source trimmed mean over an integer column: drop the
    * ⌊α·n⌋ smallest and largest observations, average the rest —
    * exact from the (source, value) count frame: a value block
    * covering ranks (cum−c, cum] contributes v · overlap with the kept
    * rank interval (lo, n−lo], so no row-level sort or filter ever
    * runs; BIGINT mass sums, one double division at output. The
    * robust location estimate between the mean (α = 0) and the median
    * (α → 0.5). */
  def trimmedMean(docs: DataFrame, valueCol: String = "n_chars",
                  alpha: Double = 0.1): DataFrame = {
    require(alpha >= 0.0 && alpha < 0.5, "alpha must be in [0, 0.5)")
    val cnt = docs.groupBy(col("source"), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("source").orderBy("v")
    val lo = floor(col("n_s").cast("double") * lit(alpha)).cast("long")
    val kept = greatest(
      least(col("cum"), col("n_s") - lo) - greatest(col("cum") - col("c"), lo),
      lit(0L))
    cnt
      .withColumn("cum", sum("c").over(w))
      .withColumn("n_s", sum("c").over(Window.partitionBy("source")))
      .groupBy("source")
      .agg(first("n_s").as("n_docs"),
        sum(kept).as("n_kept"),
        sum(col("v").cast("decimal(19,0)") * kept.cast("decimal(19,0)"))
          .as("mass"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        round(col("mass").cast("double") / col("n_kept").cast("double"), 6)
          .as("trimmed_mean"))
      .orderBy("source")
  }

  /** Winsorized mean per source — [[trimmedMean]]'s clamping twin:
    * the k = ⌊n·α⌋ lowest values are REPLACED by the α-quantile value
    * and the k highest by the (1−α)-quantile, so outliers lose their
    * leverage without losing their count. Exact off the same (source,
    * value) count frame: the two clamp values are order statistics
    * located by cumulative range, the middle mass is trimmedMean's
    * kept sum, and the closed form is (mass + k·(v_lo + v_hi))/n. */
  def winsorizedMean(docs: DataFrame, valueCol: String = "n_chars",
                     alpha: Double = 0.1): DataFrame = {
    require(alpha >= 0.0 && alpha < 0.5, "alpha must be in [0, 0.5)")
    val cnt = docs.groupBy(col("source"), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("source").orderBy("v")
    val lo = floor(col("n_s").cast("double") * lit(alpha)).cast("long")
    val kept = greatest(
      least(col("cum"), col("n_s") - lo) - greatest(col("cum") - col("c"), lo),
      lit(0L))
    val rLo = lo + 1
    val rHi = col("n_s") - lo
    cnt
      .withColumn("cum", sum("c").over(w))
      .withColumn("n_s", sum("c").over(Window.partitionBy("source")))
      .groupBy("source")
      .agg(first("n_s").as("n_docs"),
        max(lo).as("k"),
        sum(col("v").cast("decimal(19,0)") * kept.cast("decimal(19,0)"))
          .as("mass"),
        sum(when(col("cum") - col("c") < rLo && rLo <= col("cum"),
          col("v")).otherwise(0L)).as("v_lo"),
        sum(when(col("cum") - col("c") < rHi && rHi <= col("cum"),
          col("v")).otherwise(0L)).as("v_hi"))
      .select(col("source"), col("n_docs"), col("v_lo"), col("v_hi"),
        round((col("mass").cast("double") +
          col("k").cast("double") * (col("v_lo") + col("v_hi")).cast("double"))
          / col("n_docs").cast("double"), 6).as("winsor_mean"))
      .orderBy("source")
  }
}
