package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-corpus text classification — the fastText-style "can a bag-of-
  * words model tell this source apart" audit a mix designer runs
  * before trusting `source` as a stratification key: a multinomial
  * Naive Bayes classifier trained on the corpus's own (source → token)
  * counts and applied back to every document in the SAME plan. High
  * off-diagonal mass in the confusion matrix means two sources are
  * statistically indistinguishable (merging them loses nothing);
  * a too-clean diagonal on held-out-free resubstitution flags leaked
  * near-duplicates across sources.
  *
  * Reference scope note: rs-graphdb has no classifier surface; this is
  * part of the brief-mandated training-pipeline extension.
  */
object Classify {

  /** Resubstitution confusion matrix of a Laplace-smoothed multinomial
    * NB over whitespace tokens, classes = `source`.
    *
    * log P(c|d) ∝ ln(D_c/D) + Σ_t n_dt·ln((c_tc+1)/(N_c+V)), folded as
    * ln(D_c/D) − T_d·ln(N_c+V) + Σ_{t∈d, c_tc>0} n_dt·ln(c_tc+1) — the
    * unseen-token terms collapse into the one T_d·ln(N_c+V) product,
    * so scoring needs ONLY the tokens a document shares with a class
    * (the same absent-term folding as [[Stats.jsdBySource]]). Scores
    * are rounded to 6dp BEFORE the argmax and ties break on class
    * name, so the predicted label is engine-stable.
    *
    * Scale: one (doc, token) count + one (class, token) count (both
    * map-side combined); the scoring join is token-keyed — |doc
    * tokens|·k_match rows, never doc×doc; the doc×class grid is
    * |docs|·k with the k-row class stats broadcast; the argmax window
    * partitions by doc_id over exactly k rows. Output is the k×k
    * confusion matrix. */
  def naiveBayesConfusion(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "")
    val docTok = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("n_dt"))
    val classTok = toks.groupBy(col("source").as("cls"), col("t"))
      .agg(count(lit(1)).as("c_tc"))
    val vocab = classTok.select("t").distinct().agg(count(lit(1)).as("v"))
    val classStats = classTok.groupBy("cls").agg(sum("c_tc").as("n_c"))
      .crossJoin(broadcast(vocab))
    val priors = docs.groupBy(col("source").as("cls"))
      .agg(count(lit(1)).as("d_c"))
    val dTot = docs.agg(count(lit(1)).as("d"))
    // Σ_{t∈d, c_tc>0} n_dt·ln(c_tc+1): token-keyed join, then roll up
    val partials = docTok.join(classTok, Seq("t"))
      .groupBy("doc_id", "cls")
      .agg(sum(col("n_dt").cast("double") *
        log((col("c_tc") + lit(1L)).cast("double"))).as("part"))
    // doc side comes from docs DIRECTLY (t_d = 0 for empty/whitespace-
    // only text), not from the exploded token stream — token-less
    // documents still get a prediction (prior-only argmax), so the
    // confusion-matrix row totals sum to the corpus doc count
    val docSide = docs.select(col("doc_id"), col("source").as("actual"),
      regexp_count(col("text"), lit("[^ ]+")).cast("long").as("t_d"))
    val classSide = broadcast(
      classStats.join(priors, Seq("cls")).crossJoin(broadcast(dTot))
        .select(col("cls"),
          (log(col("d_c").cast("double")) - log(col("d").cast("double")))
            .as("lp"),
          log((col("n_c") + col("v")).cast("double")).as("lnv")))
    val scored = docSide.crossJoin(classSide)
      .join(partials, Seq("doc_id", "cls"), "left")
      .select(col("doc_id"), col("actual"), col("cls"),
        round(col("lp") - col("t_d").cast("double") * col("lnv") +
          coalesce(col("part"), lit(0.0)), 6).as("score"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("cls").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .groupBy(col("actual"), col("cls").as("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("actual", "predicted")
  }
}
