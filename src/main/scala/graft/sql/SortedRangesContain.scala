package graft.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Membership of a point in a set of DISJOINT sorted closed ranges:
  * `sorted_ranges_contain(starts, ends, pos)` is true iff some i has
  * starts[i] <= pos <= ends[i]. Binary search for the greatest start
  * <= pos, then one end probe — O(log n) per point, zero allocation,
  * fused into whole-stage codegen.
  *
  * The containment core of [[graft.pipeline.Corpus.stripDupSpans]]:
  * each token row meets its document's merged span set as ONE pair of
  * sorted arrays instead of one row per span (the equi-join-then-range-
  * filter shape replicates every token row once per span of its
  * document — O(tokens·spans) for a heavily-duplicated doc; this is
  * O(tokens·log spans) with no row fan-out).
  *
  * CONTRACT: `starts` ascending, ranges pairwise disjoint, and
  * `ends[i] >= starts[i]` aligned index-by-index (exactly what an
  * interval-union produces). Undefined on unsorted/overlapping input.
  * Null elements are not expected; null inputs propagate null. */
final case class SortedRangesContain(first: Expression, second: Expression,
                                     third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType

  private def arr(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (arr(first) && arr(second) && third.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_ranges_contain needs (array<bigint>, array<bigint>, bigint), " +
        s"got ${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        third.dataType.simpleString)

  override def nullSafeEval(s: Any, e: Any, p: Any): Any = {
    val starts = s.asInstanceOf[ArrayData]
    val ends = e.asInstanceOf[ArrayData]
    val pos = p.asInstanceOf[Long]
    var lo = 0; var hi = starts.numElements() - 1; var best = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (starts.getLong(mid) <= pos) { best = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    best >= 0 && pos <= ends.getLong(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, e, p) => {
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val best = ctx.freshName("best")
      s"""
        |int $lo = 0, $hi = $s.numElements() - 1, $best = -1;
        |while ($lo <= $hi) {
        |  int $mid = ($lo + $hi) >>> 1;
        |  if ($s.getLong($mid) <= $p) { $best = $mid; $lo = $mid + 1; }
        |  else $hi = $mid - 1;
        |}
        |${ev.value} = $best >= 0 && $p <= $e.getLong($best);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SortedRangesContain =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "sorted_ranges_contain"
}

object SortedRangesContain {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedRangesContain].getCanonicalName,
    "sorted_ranges_contain")

  /** Idempotent per-session registration (tests / runners); production
    * clusters use spark.sql.extensions=graft.sql.GraftExtensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sorted_ranges_contain"),
      info,
      (children: Seq[Expression]) =>
        SortedRangesContain(children(0), children(1), children(2)))
}
