package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling — the schema-health summary every
  * ingestion job emits before anything downstream trusts the data:
  * per-column non-null/null counts, mean, sample stddev, min, max.
  *
  * Scale: ALL metrics for ALL columns fold in ONE map-side-combined
  * aggregate over a single scan (no per-column pass, no shuffle beyond
  * the 1-row aggregate); the wide 1-row result is pivoted to long form
  * with a codegen'd `stack`, so the plan is scan → partial agg → final
  * agg → project at any table size. */
object Profile {

  /** (column, n_nonnull, n_null, mean, std, mn, mx) per named numeric
    * column. Doubles round to 6 dp; stddev is the sample form (NULL
    * for n < 2), matching the suite's stats contract. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        round(avg(col(c)), 6).as(s"${c}__mean"),
        round(stddev_samp(col(c)), 6).as(s"${c}__std"),
        round(min(col(c)).cast("double"), 6).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 6).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, CAST(`__n` - `${c}__nn` AS BIGINT), " +
        s"`${c}__mean`, `${c}__std`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(column, n_nonnull, n_null, mean, std, mn, mx)")
  }

  /** (column, n_nonnull, n_null, n_distinct, avg_len, min_len,
    * max_len) per named string column — the categorical half of the
    * profile (cardinality + length shape drive encoding and
    * dictionary decisions).
    *
    * Scale: still ONE scan. Multiple exact count-distincts in one
    * aggregate compile to a single Expand pass (k× row replication
    * before the partial agg) — the standard Spark plan for exact
    * multi-column cardinality; swap in approx_count_distinct when the
    * column count or cardinality makes the Expand too heavy. */
  def stringProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "stringProfile needs at least one column")
    val aggs = Seq(count(lit(1)).as("__n")) ++ cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        round(avg(length(col(c))), 6).as(s"${c}__al"),
        min(length(col(c))).cast("long").as(s"${c}__ln"),
        max(length(col(c))).cast("long").as(s"${c}__lx"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `${c}__nn`, CAST(`__n` - `${c}__nn` AS BIGINT), " +
        s"`${c}__nd`, `${c}__al`, `${c}__ln`, `${c}__lx`"
    }.mkString(", ")
    wide.selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
      "(column, n_nonnull, n_null, n_distinct, avg_len, min_len, max_len)")
  }
}
