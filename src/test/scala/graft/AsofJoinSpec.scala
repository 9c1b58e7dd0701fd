package graft

import org.apache.spark.sql.functions._
import graft.ops.AsofJoin

/** As-of join semantics on hand-built frames with known answers. */
class AsofJoinSpec extends SparkSpec {

  test("asof: most recent prior right row per key, inclusive at equal ts") {
    val implicits = spark.implicits
    import implicits._
    val left = Seq(
      (1L, 10L, 5L), // k=10: right rows at ts 2 and 5 → equal-ts row wins
      (2L, 10L, 3L), // → right ts 2
      (3L, 10L, 1L), // no right row at or before ts 1 → null
      (4L, 20L, 9L)  // other key: only its own right rows visible
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, 2L, "a"), (10L, 5L, "b"), (10L, 7L, "late"),
      (20L, 1L, "x"), (30L, 0L, "other-key")
    ).toDF("k", "rt", "v")
    val got = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(3))).toList
    assert(got == List((1L, "b"), (2L, "a"), (3L, null), (4L, "x")))
  }

  test("asof: a null-valued right row matches as a row, not skipped") {
    val implicits = spark.implicits
    import implicits._
    // the matched right ROW travels as a struct: a null v at ts 4 must
    // yield null, not fall through to the older non-null row at ts 1
    val left = Seq((1L, 1L, 5L)).toDF("id", "k", "t")
    val right = Seq((1L, 1L, Some("old")), (1L, 4L, Option.empty[String]))
      .toDF("k", "rt", "v")
    val got = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"))
      .head()
    assert(got.isNullAt(3))
  }

  test("asof: carried-column collision with the left side fails fast") {
    val implicits = spark.implicits
    import implicits._
    val left = Seq((1L, 1L, 5L, "lv")).toDF("id", "k", "t", "v")
    val right = Seq((1L, 1L, "rv")).toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("range join: bucketized matches equal the naive BETWEEN join, no dup") {
    val implicits = spark.implicits
    import implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val points = Seq(
      (1L, 10L, t("2020-01-01 10:30:00")), // inside A
      (2L, 10L, t("2020-01-01 11:00:00")), // exactly at A's end (inclusive)
      (3L, 10L, t("2020-01-01 12:30:00")), // outside all
      (4L, 20L, t("2020-01-01 10:30:00"))  // other key, inside B
    ).toDF("pid", "k", "ts")
    val intervals = Seq(
      (10L, t("2020-01-01 10:00:00"), t("2020-01-01 11:00:00"), "A"),
      // spans several 15-min buckets: must still match exactly once
      (20L, t("2020-01-01 09:50:00"), t("2020-01-01 11:10:00"), "B"),
      (10L, t("2020-01-01 20:00:00"), t("2020-01-01 21:00:00"), "C")
    ).toDF("k", "s", "e", "tag")
    val got = graft.ops.RangeJoin
      .pointInInterval(points, intervals, Seq("k"), "ts", "s", "e",
        bucketSeconds = 900L)
      .select("pid", "tag").collect().map(r => (r.getLong(0), r.getString(1)))
      .sorted.toList
    assert(got == List((1L, "A"), (2L, "A"), (4L, "B")))
    // plan is an equi-join, not a nested-loop/cartesian
    val plan = graft.ops.RangeJoin
      .pointInInterval(points, intervals, Seq("k"), "ts", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"non-equi plan:\n$plan")
  }

  test("asof: plan is one exchange on the key, no join node") {
    val implicits = spark.implicits
    import implicits._
    val left = Seq((1L, 1L, 5L)).toDF("id", "k", "t")
    val right = Seq((1L, 1L, "a")).toDF("k", "rt", "v")
    val plan = AsofJoin.asof(left, right, Seq("k"), "t", "rt", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
    assert(plan.contains("Window"), "expected a window node")
  }

  test("skew join: salted result equals the plain inner join") {
    val implicits = spark.implicits
    import implicits._
    // 90% of big rows hit key 1 (the hot key); dim carries a duplicate
    // key so the fan-out semantics of the plain join are exercised too
    val big = ((1 to 90).map(i => (1L, i.toLong)) ++
      (1 to 10).map(i => (i.toLong + 1, 100L + i))).toDF("k", "v")
    val dim = Seq((1L, "hot"), (1L, "hot2"), (2L, "a"), (3L, "b"))
      .toDF("dk", "tag")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val plain = canon(big.join(dim, col("k") === col("dk")))
    val salted = canon(graft.ops.SkewJoin.salted(big, dim, "k", "dk", 4))
    assert(salted == plain)
    // degenerate single salt is exactly the plain join as well
    assert(canon(graft.ops.SkewJoin.salted(big, dim, "k", "dk", 1)) == plain)
  }
}
