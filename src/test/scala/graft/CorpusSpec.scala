package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Corpus

/** Corpus-preparation operator semantics on hand-built inputs. */
class CorpusSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame = {
    val implicits = spark.implicits
    import implicits._
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  test("dedupClusters: chained pairs merge into one cluster labeled by min id") {
    val implicits = spark.implicits
    import implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val cl = Corpus.dedupClusters(pairs).collect()
      .map(r => r.getAs[Long]("rep_id") -> r.getAs[Long]("n_docs")).toMap
    assert(cl == Map(1L -> 3L, 5L -> 2L))
  }

  test("hashSample: deterministic, a subset, and pct=100 keeps everything") {
    val d = docs((1L to 50L).map(i => i -> s"doc number $i"): _*)
    val s1 = Corpus.hashSample(d, 20).collect().map(_.getLong(0)).toSet
    val s2 = Corpus.hashSample(d, 20).collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.subsetOf((1L to 50L).toSet))
    assert(Corpus.hashSample(d, 100).count() == 50L)
  }

  test("packBins: next-fit by cumulative offset against hand math") {
    // tokens: doc1=4, doc2=4, doc3=4, doc4=5; capacity 10.
    // offsets 0,4,8,12 → bins 0,0,0,1
    val d = docs(
      1L -> "a b c d", 2L -> "a b c d", 3L -> "a b c d", 4L -> "a b c d e")
    val bins = Corpus.packBins(d, capacity = 10L).collect()
      .map(r => r.getAs[Long]("bin") -> (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens")))
      .toMap
    assert(bins == Map(0L -> ((3L, 12L)), 1L -> ((1L, 5L))))
  }

  test("packBins: block-hierarchical cumsum equals the global definition") {
    val d = docs((1L to 300L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim): _*)
    // block size 16 forces many blocks; compare against block = huge
    // (single block ⇒ plain global window)
    val a = Corpus.packBins(d, capacity = 50L, block = 16L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Corpus.packBins(d, capacity = 50L, block = 1000000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("bm25TopK: ranks by query-term relevance, absent docs excluded") {
    val d = docs(
      1L -> "spark query spark join filler words here",  // 2×spark, query, join
      2L -> "spark alone in a much longer document with many extra words",
      3L -> "nothing relevant at all",
      4L -> "query join vector")                         // 3 distinct terms, short
    val rows = Corpus.bm25TopK(d, Seq("spark", "query", "join", "vector"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val ranked = rows.map(_._1)
    // doc 3 has no query term — excluded entirely
    assert(!ranked.contains(3L) && rows.length == 3)
    // the short doc hitting 3 distinct terms outranks both single/double
    // hitters; the long doc with one hit ranks last (length normalization)
    assert(ranked.head == 4L && ranked.last == 2L)
    assert(rows.forall(_._2 > 0.0))
    // deterministic
    val again = Corpus.bm25TopK(d, Seq("spark", "query", "join", "vector"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(again.toSeq == rows.toSeq)
  }

  test("rm3Retrieval: expansion terms recall docs plain BM25 cannot see") {
    // seed term "spark" only; feedback docs co-mention "catalyst", so
    // RM3's second round reaches the catalyst-only doc 5
    val d = docs(
      1L -> "spark catalyst spark engine",
      2L -> "spark catalyst optimizer",
      3L -> "unrelated text entirely",
      4L -> "spark streaming guide",
      5L -> "catalyst rules deep dive")
    val rm3 = Corpus.rm3Retrieval(d, Seq("spark"), fbDocs = 2,
      fbTerms = 2, k = 10).collect()
    val ids = rm3.map(_.getLong(1)).toSet
    assert(ids.contains(5L), s"expansion should recall doc 5: $ids")
    assert(!ids.contains(3L))
    // plain BM25 for the same seed cannot see doc 5
    val plain = Corpus.bm25TopK(d, Seq("spark"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(!plain.contains(5L))
    // contract: dense ranks from 1, scores non-increasing, seed docs
    // score above the expansion-only doc
    val ranks = rm3.map(_.getLong(0)).toSeq
    assert(ranks == (1L to rm3.length).toSeq)
    val scores = rm3.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
    // deterministic
    val again = Corpus.rm3Retrieval(d, Seq("spark"), fbDocs = 2,
      fbTerms = 2, k = 10).collect()
    assert(again.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq == rm3.map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2))).toSeq)
  }

  test("tfidfKeywords: characteristic terms rank above shared terms") {
    val d = docs(
      1L -> "apple apple banana",
      2L -> "banana cherry",
      3L -> "durian")
    val rows = Corpus.tfidfKeywords(d, topN = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    // doc 1: doc-unique "apple" (tf 2) beats corpus-wide "banana"
    assert(byDoc(1L).sortBy(_._4).map(_._2).toSeq == Seq("apple", "banana"))
    // hand math: (2/3)·ln(3/1) and (1/3)·ln(3/2), rounded 6 dp
    val d1 = byDoc(1L).map(t => t._2 -> t._3).toMap
    assert(d1("apple") == BigDecimal(2.0 / 3 * math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 3's only term is maximally characteristic: 1·ln(3)
    assert(byDoc(3L).map(_._2).toSeq == Seq("durian"))
    // every doc emits ≤ topN rows with rn dense from 1
    assert(byDoc.values.forall(g => g.map(_._4).sorted.toSeq == (1L to g.length)))
  }

  test("termPmi: doc-level presence, min-support filter, hand math") {
    val d = docs(
      1L -> "a b",
      2L -> "a a b", // duplicate "a" must not inflate presence counts
      3L -> "a c",
      4L -> "c d")
    val rows = Corpus.termPmi(d, minPairDocs = 2, k = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // only (a,b) co-occurs in >= 2 docs; (a,c)/(c,d) are singletons
    assert(rows.map(t => (t._1, t._2)).toSeq == Seq(("a", "b")))
    assert(rows.head._3 == 2L)
    // PMI = ln(cab·D/(ca·cb)) = ln(2·4/(3·2))
    assert(rows.head._4 == BigDecimal(math.log(2.0 * 4 / (3 * 2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // vocab prune: with vocabK = 1 only the top term survives, no pairs
    assert(Corpus.termPmi(d, vocabK = 1, minPairDocs = 1).count() == 0L)
  }

  test("hashedFeatures: L2-normalized bucket counts, stable buckets") {
    val d = docs(1L -> "a a b", 2L -> "c")
    val rows = Corpus.hashedFeatures(d, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val d1 = rows.filter(_._1 == 1L)
    // doc 1: counts (2,1) → norms (2/√5, 1/√5); doc 2 a unit vector
    assert(d1.map(_._3).sorted.toSeq ==
      Seq(1.0 / math.sqrt(5), 2.0 / math.sqrt(5)).map(x =>
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(rows.filter(_._1 == 2L).map(_._3).toSeq == Seq(1.0))
    // per-doc L2 norm ≈ 1 (up to the 6-dp rounding)
    val n1 = math.sqrt(d1.map(t => t._3 * t._3).sum)
    assert(math.abs(n1 - 1.0) < 1e-5)
    // buckets in range and deterministic across runs
    assert(rows.forall(t => t._2 >= 0L && t._2 < 64L))
    assert(Corpus.hashedFeatures(d, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      == rows.toSeq)
  }

  test("sourceKl: hand math, zero for a source matching the corpus") {
    val implicits = spark.implicits
    import implicits._
    val d = Seq((1L, "a a b", "s1"), (2L, "a b", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Corpus.sourceKl(d).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // corpus: a 3/5, b 2/5. s1: a 2/3, b 1/3; s2: a 1/2, b 1/2
    def kl(ps: Seq[(Double, Double)]) =
      BigDecimal(ps.map { case (p, q) => p * math.log(p / q) }.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("s1") == kl(Seq((2.0 / 3, 3.0 / 5), (1.0 / 3, 2.0 / 5))))
    assert(got("s2") == kl(Seq((1.0 / 2, 3.0 / 5), (1.0 / 2, 2.0 / 5))))
    // a single-source corpus diverges from itself by exactly 0
    val one = Seq((1L, "x y x", "only")).toDF("doc_id", "text", "source")
    assert(Corpus.sourceKl(one).head().getDouble(1) == 0.0)
  }

  test("vocabTopK: frequency order with lexicographic tiebreak") {
    val d = docs(1L -> "b b a a c", 2L -> "b z")
    val top = Corpus.vocabTopK(d, 3).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == Seq("b" -> 3L, "a" -> 2L, "c" -> 1L))
  }

  test("embedCentroids: per-label per-position means") {
    val implicits = spark.implicits
    import implicits._
    val e = Seq(
      (1L, Array(1.0f, 2.0f), 0), (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(10.0f, 20.0f), 1)).toDF("vec_id", "embedding", "label")
    val c = Corpus.embedCentroids(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c == Map((0L, 0L) -> 2.0, (0L, 1L) -> 3.0, (1L, 0L) -> 10.0, (1L, 1L) -> 20.0))
  }

  test("lenHistogram buckets by floor(n_chars/width)*width") {
    val d = docs(1L -> ("x" * 10), 2L -> ("y" * 60), 3L -> ("z" * 70))
    val h = Corpus.lenHistogram(d, 50L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == Map(0L -> 1L, 50L -> 2L))
  }

  test("corpusClean drops dups, low quality and lang mismatches") {
    val implicits = spark.implicits
    import implicits._
    val good = "the cat is on the mat and the dog is in the yard all day " * 3
    val d = Seq(
      (1L, good, "en"),   // kept
      (2L, good, "en"),   // dup pair member → dropped
      (3L, good, "de"),   // lang mismatch (en markers, labeled de) → dropped
      (4L, "x!", "en")    // low quality → dropped
    ).toDF("doc_id", "text", "lang")
    val pairs = Seq((2L, 9L)).toDF("a", "b")
    val kept = Corpus.corpusClean(d, pairs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map("en" -> 1L))
  }
}
