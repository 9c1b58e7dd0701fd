package graft.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Jaro–Winkler kernel, kept in a plain object (no companion
  * class) so whole-stage codegen can call the static forwarder
  * `graft.sql.JaroWinklerAlgo.sim(a, b)` directly.
  *
  * Semantics pinned to the classic Winkler definition as implemented
  * by DuckDB's `jaro_winkler_similarity` (verified empirically):
  * either side empty → 0.0 (INCLUDING both-empty); match window
  * ⌊max(l1,l2)/2⌋ − 1 clamped at 0; transpositions = half the
  * out-of-order matches (integer floor); prefix bonus capped at 4
  * chars, weight 0.1, applied only when jaro > 0.7. Comparison is by
  * Java char — identical to byte-wise for the ASCII name columns this
  * is used on. */
object JaroWinklerAlgo {
  def sim(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString; val s2 = b.toString
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - win)
      val hi = math.min(l2, i + win + 1)
      var found = false
      while (j < hi && !found) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    val j = (m.toDouble / l1 + m.toDouble / l2 +
      (m - tr).toDouble / m) / 3.0
    var p = 0
    val pMax = math.min(4, math.min(l1, l2))
    while (p < pMax && s1.charAt(p) == s2.charAt(p)) p += 1
    if (j > 0.7) j + p * 0.1 * (1.0 - j) else j
  }
}

/** Jaro–Winkler string similarity as a native Catalyst expression —
  * the record-linkage scorer (edit distance over-penalizes the long
  * shared prefixes typical of product/entity names; Jaro–Winkler is
  * the standard alternative, cf. Winkler 1990). Spark ships
  * `levenshtein` but nothing of the Jaro family; a Scala UDF would
  * break whole-stage codegen on exactly the hot pair-scoring loops
  * this is for, so it's an Expression with `doGenCode` like
  * [[ArraySortedIntersectCount]]. Null inputs propagate null. */
final case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerAlgo.sim(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.sql.JaroWinklerAlgo.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JaroWinkler].getCanonicalName, "jaro_winkler")

  /** Idempotent per-session registration (tests / runners); production
    * clusters use spark.sql.extensions=graft.sql.GraftExtensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"),
      info,
      (children: Seq[Expression]) => JaroWinkler(children(0), children(1)))
}
