package graft

import graft.graph.PropertyGraph
import graft.ops.Fulltext

/** Fulltext OR/AND retrieval semantics, mirroring the six fulltext
  * cases in the reference's tests/advanced_index_test.rs:26-126. */
class FulltextSpec extends SparkSpec {

  private def users(rows: (Long, String)*): PropertyGraph = {
    val implicits = spark.implicits
    import implicits._
    PropertyGraph(
      rows.map { case (id, bio) => (id, "User", bio) }.toDF("id", "label", "bio"),
      Seq.empty[(Long, Long, String, Double)].toDF("src", "dst", "rel_type", "weight"))
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getAs[Long]("id")).toSet

  test("add_and_search: OR returns docs containing any term (advanced_index_test.rs:26)") {
    val g = users(1L -> "software engineer", 2L -> "data scientist",
      3L -> "machine learning engineer")
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "engineer")) == Set(1L, 3L))
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "data")) == Set(2L))
  }

  test("search_and: AND demands every term (advanced_index_test.rs:51)") {
    val g = users(1L -> "machine learning engineer", 2L -> "machine learning",
      3L -> "deep learning")
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "machine learning",
      requireAll = true)) == Set(1L, 2L))
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "learning engineer",
      requireAll = true)) == Set(1L))
  }

  test("case insensitive both directions (advanced_index_test.rs:76)") {
    val g = users(1L -> "Software Developer")
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "software")) == Set(1L))
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "SOFTWARE")) == Set(1L))
  }

  test("unseen term: empty result, AND with one unseen term empties everything (advanced_index_test.rs:92)") {
    val g = users(1L -> "software engineer")
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "hardware")).isEmpty)
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "software hardware",
      requireAll = true)).isEmpty)
    // ...but OR still matches on the seen term
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "software hardware")) == Set(1L))
  }

  test("multiple words all individually searchable (advanced_index_test.rs:106)") {
    val g = users(1L -> "full stack web developer")
    for (t <- Seq("stack", "web", "developer"))
      assert(ids(Fulltext.searchFulltext(g, "User", "bio", t)) == Set(1L), t)
  }

  test("rankedSearch: fulltext retrieval composed with BM25 scoring") {
    val implicits = spark.implicits
    import implicits._
    // equal-length docs: the two-term match must outrank the one-term
    // matches, non-matching docs never appear
    val docs = Seq(
      (1L, "spark query alpha beta"),
      (2L, "spark omega alpha beta"),
      (3L, "query omega alpha beta"),
      (4L, "omega gamma alpha beta")).toDF("doc_id", "text")
    val r = Fulltext.rankedSearch(docs, "doc_id", "text", "Spark, query!")
      .collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // 4 never matches
    assert(r(0).getAs[Long]("n_matched") == 2L)
    assert(r(1).getAs[Long]("n_matched") == 1L && r(2).getAs[Long]("n_matched") == 1L)
    assert(r(0).getAs[Double]("bm25") > r(1).getAs[Double]("bm25"))
    // equal scores (same df, tf, dl) tiebreak by doc_id
    assert(r(1).getAs[Double]("bm25") == r(2).getAs[Double]("bm25"))
  }

  test("tokenizer: punctuation stripped, label scoping, empty query") {
    val implicits = spark.implicits
    import implicits._
    val g = PropertyGraph(
      Seq((1L, "User", "C++, (systems) programming!"),
        (9L, "Bot", "systems biology")).toDF("id", "label", "bio"),
      Seq.empty[(Long, Long, String, Double)].toDF("src", "dst", "rel_type", "weight"))
    // "C++," tokenizes to "c"; "(systems)" to "systems" — reference
    // tokenizer keeps alphanumerics only (index_advanced.rs:74)
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "c systems",
      requireAll = true)) == Set(1L))
    // the Bot node also says "systems" but is outside the (label, prop) scope
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "systems")) == Set(1L))
    // empty / punctuation-only query → empty result, not all docs
    assert(Fulltext.tokenizeQuery("!!! ...").isEmpty)
    assert(ids(Fulltext.searchFulltext(g, "User", "bio", "!!! ...")).isEmpty)
  }
}
