package graft.ops

import graft.graph.PropertyGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fulltext OR / AND retrieval — the Spark re-expression of the
  * reference's fulltext index (reference: src/index_advanced.rs:129
  * `search`, :168 `search_and`, surfaced as `db.add_fulltext_index` /
  * `search_fulltext` / `search_fulltext_and` in src/graph/db.rs:518-563
  * and exercised by tests/advanced_index_test.rs:26-126).
  *
  * Reference semantics, kept exactly:
  *   - tokenizer (index_advanced.rs:74): whitespace split, strip every
  *     non-alphanumeric character from each word, lowercase, drop
  *     empties — "Software Developer!" indexes as [software, developer];
  *   - `search` (OR): ids whose property contains ANY query term;
  *   - `search_and` (AND): ids whose property contains ALL query terms
  *     (an unseen term empties the result);
  *   - empty query → empty result.
  *
  * Spark-first shape: the reference maintains a HashMap inverted index
  * because it re-tokenizes per lookup; here the "index" IS the scan —
  * one token explode with the tiny query-term IN-list pushed below the
  * aggregate, then a doc-keyed map-side-combined distinct-term count.
  * OR = n_matched ≥ 1, AND = n_matched = |query terms| (the standard
  * distributed set-containment trick — no per-term join chain, so the
  * plan is ONE shuffle regardless of query length). At 100 TB the
  * IN-list prunes the token stream before the shuffle, and the result
  * is bounded by matching documents, never the corpus.
  */
object Fulltext {

  /** The reference tokenizer (index_advanced.rs:74), driver side for the
    * query string: whitespace split → keep alphanumerics per word →
    * lowercase → drop empties. Distinct, because AND counts distinct
    * matched terms ("machine machine" must not demand multiplicity). */
  def tokenizeQuery(query: String): Seq[String] =
    query.split("\\s+").toSeq
      .map(w => w.filter(Character.isLetterOrDigit).toLowerCase)
      .filter(_.nonEmpty)
      .distinct

  /** The same tokenizer over a text column: (id, term) stream, one row
    * per token occurrence (dedup happens in the aggregate). */
  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), "\\s+")).as("w"))
      .select(col(idCol),
        lower(regexp_replace(col("w"), "[^\\p{L}\\p{N}]", "")).as("term"))
      .filter(col("term") =!= "")

  /** Distinct query terms matched per document — the shared kernel.
    * Output: (idCol, n_matched) for every doc matching ≥ 1 term. */
  def matchCounts(df: DataFrame, idCol: String, textCol: String,
                  query: String): DataFrame = {
    val qTerms = tokenizeQuery(query)
    if (qTerms.isEmpty)
      // reference: empty tokenized query → empty result (not all docs)
      df.select(col(idCol), lit(0L).as("n_matched")).limit(0)
    else
      tokens(df, idCol, textCol)
        .filter(col("term").isInCollection(qTerms))
        .groupBy(idCol)
        .agg(count_distinct(col("term")).cast("long").as("n_matched"))
  }

  /** OR retrieval (reference `search`, index_advanced.rs:129): ids whose
    * text contains ANY query term, with the matched-term count. */
  def searchAny(df: DataFrame, idCol: String, textCol: String,
                query: String): DataFrame =
    matchCounts(df, idCol, textCol, query)

  /** AND retrieval (reference `search_and`, index_advanced.rs:168): ids
    * whose text contains ALL query terms. */
  def searchAll(df: DataFrame, idCol: String, textCol: String,
                query: String): DataFrame = {
    val n = tokenizeQuery(query).size
    matchCounts(df, idCol, textCol, query).filter(col("n_matched") === n)
  }

  /** Ranked fulltext retrieval — the reference's `search` composed with
    * the engine's BM25 scorer (Robertson idf, Lucene-positive form —
    * the q_bm25 formula op for op) over the REFERENCE tokenizer's
    * cleaned token stream: docs matching ANY query term are candidates
    * (the implicit OR retrieval — only matching docs ever reach the
    * scorer), idf/avgdl come from the whole corpus, and the top k rank
    * by score with a doc_id tiebreak. Output (id, n_matched, bm25) —
    * n_matched grades the OR→AND spectrum for free.
    *
    * Scale: one token explode; dl/avgdl are map-side-combined
    * aggregates; the query-term tf stream is IN-list-pruned before its
    * shuffle; df broadcasts (≤ |query| rows); top-k is a distributed
    * TakeOrdered, never a full sort. */
  def rankedSearch(df: DataFrame, idCol: String, textCol: String,
                   query: String, k1: Double = 1.2, b: Double = 0.75,
                   k: Int = 20): DataFrame = {
    val qTerms = tokenizeQuery(query)
    require(qTerms.nonEmpty, "rankedSearch needs a non-empty tokenized query")
    val toks = tokens(df, idCol, textCol)
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("term").isInCollection(qTerms))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) — operator order
    // mirrored verbatim in the DuckDB oracle so the doubles agree
    val scored = tf
      .join(broadcast(dfT), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(idCol),
        (log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")))).as("s"),
        col("term"))
      .groupBy(idCol)
      .agg(sum("s").as("score"),
        count_distinct(col("term")).cast("long").as("n_matched"))
    scored.select(col(idCol), col("n_matched"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol).asc).limit(k)
  }

  /** The reference's db-level surface (db.rs:518-563): search a (label,
    * property) of the property graph, returning matching node ids. The
    * label predicate prunes the union'd node table to one scan
    * (PlanSpec-pinned for labeled scans) before tokenizing. */
  def searchFulltext(graph: PropertyGraph, label: String, property: String,
                     query: String, requireAll: Boolean = false): DataFrame = {
    val scoped = graph.nodes.filter(col("label") === label)
      .select(col("id"), col(property).cast("string").as("__ft_text"))
      .filter(col("__ft_text").isNotNull)
    val hits =
      if (requireAll) searchAll(scoped, "id", "__ft_text", query)
      else searchAny(scoped, "id", "__ft_text", query)
    hits.select("id")
  }
}
