package graft.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| of two SORTED long set-arrays by a two-pointer merge — the
  * counting core of the pair-scoring operators (n-gram Jaccard,
  * containment). `size(array_intersect(a, b))` builds a per-row hash
  * set AND materializes the intersection array only to take its
  * length; over ~10⁶ candidate pairs × ~10³-element shingle sets that
  * allocation is the dominant cost of the whole operator. This
  * expression walks both arrays once — zero allocation, fused into
  * whole-stage codegen.
  *
  * CONTRACT: both inputs must be duplicate-free and ascending (the
  * shingle-set arrays are built with sort_array(collect_set(...)));
  * on unsorted input the count is undefined. Null elements are not
  * expected (hashes are non-null); null ARRAYS propagate null. */
final case class ArraySortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_sorted_intersect_count needs array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
        |int $na = $a.numElements(), $nb = $b.numElements();
        |int $i = 0, $j = 0;
        |long ${ev.value}_c = 0L;
        |while ($i < $na && $j < $nb) {
        |  long $x = $a.getLong($i); long $y = $b.getLong($j);
        |  if ($x == $y) { ${ev.value}_c++; $i++; $j++; }
        |  else if ($x < $y) $i++; else $j++;
        |}
        |${ev.value} = ${ev.value}_c;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArraySortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_sorted_intersect_count"
}

object ArraySortedIntersectCount {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArraySortedIntersectCount].getCanonicalName,
    "array_sorted_intersect_count")

  /** Idempotent per-session registration (tests / runners); production
    * clusters use spark.sql.extensions=graft.sql.GraftExtensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("array_sorted_intersect_count"),
      info,
      (children: Seq[Expression]) =>
        ArraySortedIntersectCount(children(0), children(1)))
}
