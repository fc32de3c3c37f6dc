package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash over a token array: each token's xxhash64 votes
  * ±1 per bit; the fingerprint is the sign vector. One pass over the
  * tokens with a 64-int vote table — replaces the composable form's 64
  * separate interpreted `aggregate` folds (Dedup.simhash64's original
  * shape), and stays inside whole-stage codegen via a static call.
  *
  * Uses the same xxhash64 (seed 42) as Spark's `xxhash64` function, so
  * `simhash64(tokens)` relates to per-token `xxhash64` values a user can
  * inspect.
  */
case class Simhash64Expr(child: Expression) extends UnaryExpression
    with Serializable {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    Simhash64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.Simhash64Expr.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash64Expr {
  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
