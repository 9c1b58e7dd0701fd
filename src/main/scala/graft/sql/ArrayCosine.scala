package graft.sql

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two numeric array columns —
  * the "custom Catalyst Expression beats UDF" path for the similarity
  * operators: a single fused loop per row inside whole-stage codegen, no
  * explode, no boxing (a Scala UDF would deserialize both arrays to
  * WrappedArray per row).
  *
  * Semantics: Σxy / (√Σx² · √Σy²) over the common prefix of the two
  * arrays, accumulating in double, left-to-right (deterministic); 0.0
  * when either norm is 0; null if either input is null.
  */
final case class ArrayCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _                                          => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_cosine needs array<float|double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case _          => throw new IllegalStateException("unreachable")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else get(a, ta, i)
      val y = if (b.isNullAt(i)) 0.0 else get(b, tb, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double x = $a.isNullAt($i) ? 0.0 : ${getter(ta, a, i)};
        |  double y = $b.isNullAt($i) ? 0.0 : ${getter(tb, b, i)};
        |  $dot += x * y; $na += x * x; $nb += y * y;
        |}
        |${ev.value} = ($na == 0.0 || $nb == 0.0)
        |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ArrayCosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "array_cosine"
}

object ArrayCosine {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[ArrayCosine].getCanonicalName, "array_cosine")

  /** Register on a live session (tests / REPL); production clusters use
    * spark.sql.extensions=graft.sql.GraftExtensions instead. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("array_cosine"),
      info,
      (children: Seq[Expression]) => ArrayCosine(children(0), children(1)))
}
