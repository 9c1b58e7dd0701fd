package graft.sql

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 60-bit md5 prefix hash — bit-identical to the
  * SQL formula `conv(substring(md5(s), 1, 15), 16, 10)` (and DuckDB's
  * `('0x' || substr(md5(s), 1, 15))::BIGINT`) that every hashing
  * pipeline operator (minhash, simhash, fingerprint, sampling,
  * decontamination, boilerplate) keys on: the first 15 hex chars of
  * the digest are exactly the big-endian first-8-bytes value shifted
  * right by one nibble, so the expression digests once and shifts —
  * no 32-char hex string, no substring copy, no string-based base
  * conversion, one fused call inside whole-stage codegen.
  */
final case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 needs a string input, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    Hash60.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.Hash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)

  override def prettyName: String = "graft_hash60"
}

object Hash60 {
  // MessageDigest is not thread-safe; one instance per executor thread,
  // reset per row (allocation-free steady state).
  private val md = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(s.getBytes)
    // big-endian first 8 digest bytes, dropped low nibble = the value
    // of the first 15 hex chars
    val be =
      ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
    be >>> 4
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Hash60].getCanonicalName, "graft_hash60")

  /** Idempotent per-session registration (tests / runners); production
    * clusters use spark.sql.extensions=graft.sql.GraftExtensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_hash60"),
      info,
      (children: Seq[Expression]) => Hash60(children.head))
}
