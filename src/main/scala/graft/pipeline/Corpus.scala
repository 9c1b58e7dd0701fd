package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.hash60

/** Corpus-preparation operators for LLM training-data pipelines, beyond
  * the near-dup family in [[Dedup]]: cluster + canonicalize duplicates,
  * deterministic sampling, token-budget packing, vocabulary extraction,
  * embedding centroids, length histograms, and an end-to-end cleaning
  * filter. No counterpart in the reference (a graph engine); these are
  * the standard corpus-prep recipes, all shuffle-bounded.
  */
object Corpus {

  /** Near-duplicate clusters: connected components over the candidate
    * pair graph (e.g. [[Dedup.minhashPairs]]), each cluster labeled by
    * its minimum member doc_id. Returns (rep_id, n_docs) per cluster —
    * the keep-one-representative contract of corpus dedup. Only docs
    * appearing in some pair form clusters (singletons are implicitly
    * kept). Scale: one CC fixpoint over |pairs| edges, O(log n) rounds
    * via pointer doubling. */
  def dedupClusters(pairs: DataFrame, maxIter: Int = 15): DataFrame = {
    val sym = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    val nodes = sym.select(col("src").as("id")).distinct()
    graft.algorithms.Community.connectedComponents(nodes, sym, maxIter)
      .groupBy(col("component").as("rep_id"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
  }

  /** Deterministic hash sampling: keep a doc iff its 60-bit md5 bucket
    * over the doc_id (with a salt prefix) lands under `pct` of 100.
    * Reproducible across engines/runs, no RNG state, stable under
    * repartitioning — the standard corpus down-sampling primitive. */
  def hashSample(docs: DataFrame, pct: Int = 10): DataFrame =
    docs.filter(
        pmod(hash60(col("doc_id").cast("string"), "s:"), lit(100L)) < pct)
      .select(col("doc_id"), col("lang"))

  /** Token-budget sequence packing: docs in doc_id order are laid out
    * contiguously and cut into bins of `capacity` tokens (next-fit by
    * cumulative offset — a doc starts in the bin its running offset
    * falls into). Returns (bin, n_docs, total_tokens).
    *
    * Scale: the global running sum is computed hierarchically — an
    * intra-block window partitioned by doc_id block plus a tiny
    * ordered window over the |corpus|/block block sums — so no stage
    * ever globally sorts the corpus into one partition. */
  def packBins(docs: DataFrame, capacity: Long = 512L,
               block: Long = 4096L): DataFrame = {
    val tok = docs.select(col("doc_id"),
      regexp_count(col("text"), lit("[^ ]+")).cast("long").as("tokens"))
      .withColumn("blk", floor(col("doc_id") / block))
    val wBlocks = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = tok.groupBy("blk").agg(sum("tokens").as("bs"))
      .withColumn("off", coalesce(sum("bs").over(wBlocks), lit(0L)))
      .select("blk", "off")
    val wIn = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tok.join(broadcast(offsets), Seq("blk"))
      .withColumn("cum", col("off") + sum("tokens").over(wIn))
      .select(col("doc_id"), col("tokens"),
        floor((col("cum") - col("tokens")) / capacity).as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).cast("long").as("n_docs"),
           sum("tokens").as("total_tokens"))
  }

  /** Vocabulary extraction: top-k whitespace terms by frequency
    * (count desc, term asc tiebreak). One explode + one map-side-
    * combined count + a distributed top-k (TakeOrdered) — never a
    * global sort of the term table. */
  def vocabTopK(docs: DataFrame, k: Int = 50): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)

  /** Per-label embedding centroids in long format: (label, pos, c) with
    * c = mean of component `pos` over the label's vectors, rounded to
    * 6 dp. posexplode keeps the shuffle narrow ((label, pos) keyed,
    * map-side combined) at any row count. */
  def embedCentroids(emb: DataFrame): DataFrame =
    emb.select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(round(avg(col("x").cast("double")), 6).as("c"))

  /** Document length histogram over the `n_chars` column: fixed-width
    * buckets (bucket = floor(n_chars / width) * width) → doc counts. */
  def lenHistogram(docs: DataFrame, width: Long = 50L): DataFrame =
    docs.select((floor(col("n_chars") / width) * width).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).cast("long").as("n_docs"))

  /** End-to-end corpus cleaning: keep docs whose language-ID guess
    * matches the labeled lang, whose quality score is ≥ `minQuality`,
    * and which are NOT a member of any near-dup candidate pair; report
    * survivors per language. Composes [[TextOps.langId]],
    * [[TextOps.quality]] and the pair frame (one anti-join). */
  def corpusClean(docs: DataFrame, pairs: DataFrame,
                  minQuality: Double = 0.5): DataFrame = {
    val dup = pairs.select(col("a").as("doc_id"))
      .unionByName(pairs.select(col("b").as("doc_id"))).distinct()
    TextOps.langId(docs).filter(col("matches"))
      .join(TextOps.quality(docs).filter(col("quality") >= minQuality),
        Seq("doc_id"))
      .join(dup, Seq("doc_id"), "left_anti")
      .groupBy("lang").agg(count(lit(1)).cast("long").as("kept"))
  }
}
