package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the temporal join Spark's built-in
  * operators don't express directly: every left row picks up the
  * single right row with the largest right timestamp ≤ the left
  * timestamp within the same key group (LEFT semantics: unmatched
  * left rows keep null right values).
  *
  * Implementation is the union–window idiom rather than a join: tag
  * both sides, union, and run one `last(..., ignoreNulls)` window
  * ordered by (ts, side) per key — right rows sort before left rows
  * at equal timestamps, which yields the inclusive `≤` match. That
  * costs exactly ONE shuffle (hash by key, sort by timestamp within
  * partitions) and never materializes a per-key cross product, unlike
  * the naive `l.join(r, keys).where(r.ts <= l.ts)` + argmax plan
  * whose intermediate is |matches| rows — on a 100 TB event log the
  * union–window plan is the difference between a sort-based single
  * pass and a quadratic-per-hot-key blowup. Key skew lands in one
  * sorted partition per key, the same regime as any windowed
  * aggregation (AQE-visible, salting composes if a key is truly
  * degenerate).
  *
  * The matched right ROW travels as one struct through the window, so
  * legitimately-null right value columns never fall through to an
  * older right row. Right rows should be unique per (keys, rightTs);
  * with duplicates the surviving row follows the window's sort-stable
  * order rather than a semantic rule (same contract as DuckDB's ASOF
  * JOIN, which this operator's oracle checks against).
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && valueCols.nonEmpty, "asof needs keys and valueCols")
    val leftCols = left.columns.toSeq
    require(valueCols.intersect(leftCols).isEmpty,
      s"carried right columns ${valueCols.intersect(leftCols).mkString(",")} " +
        "collide with left columns — alias them on the right side first")
    // right side: key cols + event time + the carried row as a struct
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"),
        struct(valueCols.map(col): _*).as("__rv")): _*)
      .withColumn("__side", lit(0))
    // left side: full row + nulls for the carried struct
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r.select(l.columns.map(c =>
        if (r.columns.contains(c)) col(c)
        else lit(null).cast(l.schema(c).dataType).as(c)): _*))
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"__m.$v").as(v)): _*)
  }
}
