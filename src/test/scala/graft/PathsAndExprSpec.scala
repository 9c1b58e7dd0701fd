package graft

import org.apache.spark.sql.functions._
import graft.algorithms.Paths
import graft.graph.GraphBuilder
import graft.sql.ArrayCosine

class PathsAndExprSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    val implicits = spark.implicits
    import implicits._
    pairs.toDF("src", "dst")
  }

  test("simplePaths enumerates exactly the simple paths, dst terminal") {
    // 1→2→4, 1→3→4, 1→4, and a cycle 2→1 that must not loop
    val e = edges(1L -> 2L, 2L -> 4L, 1L -> 3L, 3L -> 4L, 1L -> 4L, 2L -> 1L, 4L -> 2L)
    val paths = Paths.simplePaths(e, 1L, 4L, 3).collect().map(_.getString(0)).toSet
    assert(paths == Set("1->2->4", "1->3->4", "1->4"))
  }

  test("simplePaths respects maxLen") {
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L)
    assert(Paths.simplePaths(e, 1L, 4L, 2).count() == 0)
    assert(Paths.simplePaths(e, 1L, 4L, 3).count() == 1)
  }

  test("hasPath") {
    val e = edges(1L -> 2L, 2L -> 3L)
    assert(Paths.hasPath(e, 1L, 3L, 5))
    assert(!Paths.hasPath(e, 3L, 1L, 5))
  }

  test("array_cosine matches the explode-based cosine on real embeddings") {
    ArrayCosine.register(spark)
    val emb = GraphBuilder.table(spark, sfDir, "embeddings")
    val a = emb.select(col("vec_id").as("qid"), col("embedding").as("ea")).filter(col("qid") < 5)
    val native = a.crossJoin(emb.select(col("vec_id").as("vid"), col("embedding").as("eb")))
      .filter(col("vid") >= 5)
      .select(col("qid"), col("vid"),
        round(call_function("array_cosine", col("ea"), col("eb")), 6).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val brute = graft.pipeline.Similarity.cosineTopK(emb, probeMax = 5, k = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    brute.foreach { case (k, v) => assert(math.abs(native(k) - v) <= 1e-6) }
  }

  test("array_cosine stays inside whole-stage codegen") {
    ArrayCosine.register(spark)
    val emb = GraphBuilder.table(spark, sfDir, "embeddings")
    val plan = emb.select(call_function("array_cosine", col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // '*(n)' prefixes mark whole-stage-codegen stages in executedPlan text
    assert(plan.contains("*(1) Project"), plan.take(500))
    // identical vectors → cosine 1
    val vals = emb.select(call_function("array_cosine", col("embedding"), col("embedding")))
      .collect().map(_.getDouble(0))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("jaro_winkler: literature values, boundary boost, codegen, nulls") {
    graft.sql.JaroWinkler.register(spark)
    val implicits = spark.implicits
    import implicits._
    // (a, b, expected) — Winkler's own test pairs + the pinned
    // DuckDB edge semantics (empty-empty → 0; boost fires at j = 0.7)
    val cases = Seq(
      ("martha", "marhta", 0.961111),
      ("dwayne", "duane", 0.84),
      ("dixon", "dicksonx", 0.813333),
      ("abcUVW", "abcDE", 0.79),       // j = 0.7 exactly: boost applies
      ("aXXXXXX", "aYYYYYY", 0.428571), // j < 0.7: NO prefix boost
      ("crane", "trace", 0.733333),     // j > 0.7 but prefix 0
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0),
      ("abc", "", 0.0),
      ("", "", 0.0))
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val got = df.select(
        round(call_function("jaro_winkler", col("a"), col("b")), 6))
      .collect().map(_.getDouble(0))
    cases.map(_._3).zip(got).foreach { case (exp, g) =>
      assert(g == exp, s"expected $exp got $g")
    }
    // whole-stage codegen: the scorer must not break the Project span
    // (a literal toDF folds to LocalTableScan, so plan over parquet)
    val part = GraphBuilder.table(spark, sfDir, "part")
    val plan = part
      .select(call_function("jaro_winkler", col("p_name"), col("p_brand")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan.take(500))
    val withNull = df.limit(1).select(
      call_function("jaro_winkler", lit(null).cast("string"), col("b")))
    assert(withNull.head.isNullAt(0))
  }

  test("array_cosine edge cases: zero norm and nulls") {
    ArrayCosine.register(spark)
    val implicits = spark.implicits
    import implicits._
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val out = df.select(call_function("array_cosine", col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 0.0 && math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
    val withNull = df.limit(1).select(
      call_function("array_cosine", lit(null).cast("array<float>"), col("b")))
    assert(withNull.head.isNullAt(0))
  }
}
