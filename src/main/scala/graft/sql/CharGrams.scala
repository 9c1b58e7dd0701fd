package graft.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native character k-gram generator: one (pos, sh) row per k-char
  * gram of the input string, pos 1-based in CODE POINTS — exactly the
  * rows of the SQL formula
  * `posexplode(transform(sequence(1, greatest(length(text)-k+1, 1)),
  * i -> substring(text, i, k)))`, including the short-input contract
  * (len < k ⇒ one truncated-prefix gram; "" ⇒ one "" gram; null ⇒ no
  * rows).
  *
  * Why an expression instead of that formula: `transform` materializes
  * a |text|-element array per row (a multi-MB document becomes a
  * multi-hundred-MB task spike), and each `substring(text, i, k)` call
  * walks the string from byte 0 to find char offset i (UTF8 is
  * variable-width), making the formula QUADRATIC in |text|. This
  * generator streams rows out of GenerateExec with O(1) state — two
  * byte cursors advanced one code point per gram — so a document costs
  * O(|text|) bytes walked and one small UTF8String per gram, at any
  * document length. */
final case class CharGrams(child: Expression, k: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(k >= 1, "gram width must be >= 1")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("sh", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_chargrams needs a string input, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = child.eval(input).asInstanceOf[UTF8String]
    if (t == null) Iterator.empty else CharGrams.iterate(t, k)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)

  override def prettyName: String = "graft_chargrams"
}

object CharGrams {

  /** Stream the (pos, gram) rows of `t`: two byte cursors — startByte
    * at char i, endByte at char i+k (clamped to the end) — each
    * advanced one UTF8 code point per emitted gram. */
  def iterate(t: UTF8String, k: Int): Iterator[InternalRow] = {
    val bytes = t.getBytes
    val nBytes = bytes.length
    val nGrams = math.max(t.numChars() - k + 1, 1)
    new Iterator[InternalRow] {
      private var i = 0L
      private var startByte = 0
      private var endByte = {
        var off = 0; var c = 0
        while (c < k && off < nBytes) {
          off += UTF8String.numBytesForFirstByte(bytes(off)); c += 1
        }
        off
      }
      override def hasNext: Boolean = i < nGrams
      override def next(): InternalRow = {
        val row = new GenericInternalRow(2)
        row.update(0, i + 1L)
        row.update(1, UTF8String.fromBytes(bytes, startByte, endByte - startByte))
        i += 1
        if (i < nGrams) {
          startByte += UTF8String.numBytesForFirstByte(bytes(startByte))
          if (endByte < nBytes)
            endByte += UTF8String.numBytesForFirstByte(bytes(endByte))
        }
        row
      }
    }
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CharGrams].getCanonicalName, "graft_chargrams")

  private[sql] def build(children: Seq[Expression]): CharGrams = {
    require(children.length == 2, "graft_chargrams(text, k) takes two arguments")
    val k = children(1) match {
      case Literal(v: Int, IntegerType) => v
      case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
      case _ => throw new IllegalArgumentException(
        "graft_chargrams k must be a literal integer")
    }
    CharGrams(children.head, k)
  }

  /** Idempotent per-session registration (tests / runners); production
    * clusters use spark.sql.extensions=graft.sql.GraftExtensions. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_chargrams"), info,
      (children: Seq[Expression]) => build(children))
}
