package graft.sql

import java.text.Normalizer

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode NFC normalization (UAX #15 canonical
  * composition via `java.text.Normalizer`) — Spark ships no normalizer
  * function, DuckDB ships `nfc_normalize`, and a corpus audit needs
  * the SAME canonical form on both engines. `isNormalized` fast-path:
  * ASCII and already-NFC strings (the overwhelming majority of any
  * real corpus) return the input UTF8String unchanged, so the audit
  * scan is allocation-free on clean data. */
final case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_nfc needs a string input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NfcNormalize].getCanonicalName, "graft_nfc")

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_nfc"),
      info,
      (children: Seq[Expression]) => NfcNormalize(children.head))
}
