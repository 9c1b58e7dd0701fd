package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two sort
  * keys so that range predicates on EITHER key prune most files — the
  * standard lakehouse multi-dimensional clustering trick (Morton 1966;
  * the same layout Delta/Iceberg expose as `OPTIMIZE ZORDER BY`).
  *
  * At 100 TB this is a WRITE-side operator: compute the z-value, then
  * `repartitionByRange` on it and write, so each output file covers a
  * small bounding box in (a, b) space and min/max file stats prune on
  * both dimensions. The curve math is a pure per-row bit fold — codegen
  * arithmetic, zero shuffle; the only shuffle is the final range
  * exchange the rewrite needs anyway. [[zorderStats]] is the audit
  * query: fixed-width curve buckets with their per-key bounding boxes —
  * tight boxes = effective pruning. Buckets derive from the z-value's
  * top bits (deterministic), not from sampled range boundaries, so the
  * audit is reproducible across engines.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of `a` (odd positions)
    * and `b` (even positions) as a BIGINT column. Requires both keys
    * non-negative and < 2^bits for a faithful curve (higher bits are
    * simply ignored, like any fixed-width z-index). */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "zValue needs bits in [1, 31]")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** Range-partition `df` along the (aCol, bCol) Morton curve — the
    * layout step a writer runs before `.write` so file min/max stats
    * prune on both keys. */
  def layout(df: DataFrame, aCol: String, bCol: String, bits: Int,
             partitions: Int): DataFrame =
    df.withColumn("_z", zValue(col(aCol), col(bCol), bits))
      .repartitionByRange(partitions, col("_z"))

  /** Layout audit: min-max quantize both keys onto the curve's
    * 2^bits-wide domain (exact integer arithmetic — (k−min)·(2^bits−1)
    * DIV (max−min), so every engine lands the same cell regardless of
    * the keys' natural ranges or the SF), bucket rows by the z-value's
    * top `bucketBits` bits, and report each bucket's row count and
    * per-key bounding box. A good multi-dimensional layout shows every
    * bucket covering a small range of BOTH keys (versus a single-key
    * sort, where the second key's boxes span the full domain).
    *
    * Scale: the 4-value extent aggregate broadcasts into a per-row
    * codegen'd quantize+interleave; ONE groupBy shuffle of
    * ≤ 2^bucketBits groups ends the plan. */
  def zorderStats(df: DataFrame, aCol: String, bCol: String,
                  bits: Int, bucketBits: Int): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      "zorderStats needs 1 <= bucketBits <= 2*bits")
    val m = (1L << bits) - 1
    val ext = df.agg(min(aCol).as("amin"), max(aCol).as("amax"),
      min(bCol).as("bmin"), max(bCol).as("bmax"))
    df.select(col(aCol).as("a"), col(bCol).as("b"))
      .crossJoin(broadcast(ext))
      .select(col("a"), col("b"),
        when(col("amax") === col("amin"), lit(0L))
          .otherwise(expr(s"((a - amin) * $m) DIV (amax - amin)")).as("qa"),
        when(col("bmax") === col("bmin"), lit(0L))
          .otherwise(expr(s"((b - bmin) * $m) DIV (bmax - bmin)")).as("qb"))
      .select(col("a"), col("b"), zValue(col("qa"), col("qb"), bits).as("z"))
      .groupBy(shiftright(col("z"), 2 * bits - bucketBits).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min("a").as("a_min"), max("a").as("a_max"),
        min("b").as("b_min"), max("b").as("b_max"))
  }
}
