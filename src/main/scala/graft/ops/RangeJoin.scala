package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the other temporal join Spark's
  * planner degrades on: `p.ts BETWEEN i.start AND i.end` is a
  * non-equi predicate, so the built-in planner gives a broadcast
  * nested-loop (or cartesian) whose cost is |points|·|intervals| per
  * key. This operator bucketizes time instead: every interval
  * explodes into the fixed-width buckets it overlaps (fan-out is
  * bounded by interval-length / bucket-width + 1), every point maps
  * to exactly ONE bucket, and the match becomes a plain equi-join on
  * (keys, bucket) + a residual BETWEEN filter. Because a point lives
  * in a single bucket, an interval can meet it in at most one bucket
  * — no post-join dedup. Pick `bucketSeconds` near the typical
  * interval length: shorter buckets mean more interval replicas,
  * longer buckets mean more false candidates for the residual filter.
  * The equi-join shuffles by (keys, bucket), so time itself spreads
  * hot keys across partitions — the skew profile a 100 TB event log
  * needs, and Catalyst still gets to pick broadcast vs sort-merge.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      bucketSeconds: Long = 3600L): DataFrame = {
    require(keys.nonEmpty && bucketSeconds > 0, "needs keys and a bucket width")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet).diff(keys.toSet)
    require(overlap.isEmpty,
      s"non-key columns ${overlap.mkString(",")} exist on both sides — alias first")
    val pb = points.withColumn("__b",
      floor(unix_timestamp(col(ptCol)) / bucketSeconds))
    val ib = intervals.withColumn("__b", explode(sequence(
      floor(unix_timestamp(col(startCol)) / bucketSeconds),
      floor(unix_timestamp(col(endCol)) / bucketSeconds))))
    pb.join(ib, keys :+ "__b")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__b")
  }
}
