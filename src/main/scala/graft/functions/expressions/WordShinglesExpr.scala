package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word `gram`-gram shingles of a token array in one native pass
  * (first-occurrence order, matching `array_distinct(wordShingles(...))`).
  * The composable form re-evaluates the token subtree per window element
  * inside an interpreted higher-order lambda — this is the verify-side
  * twin of [[LshBandKeysExpr]] (same window semantics: concat_ws-style
  * null skipping, one "" shingle for an empty token array).
  */
case class WordShinglesExpr(child: Expression, gram: Int)
    extends UnaryExpression with Serializable {

  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires array<string>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.compute(input.asInstanceOf[ArrayData], gram)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.WordShinglesExpr.compute($a, $gram)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpr {

  /** The shingle-set core shared with [[LshBandKeysExpr]] — ONE definition
    * of the window semantics, so band keys and verify-side shingle sets
    * can never drift apart.
    */
  def shingleSet(tokens: ArrayData, gram: Int): java.util.LinkedHashSet[String] = {
    val n = tokens.numElements()
    val out = new java.util.LinkedHashSet[String]()
    val last = math.max(n - gram, 0)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder
      var j = i
      var first = true
      while (j < math.min(i + gram, n)) {
        if (!tokens.isNullAt(j)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(j).toString)
          first = false
        }
        j += 1
      }
      out.add(sb.toString)
      i += 1
    }
    out
  }

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, gram: Int): ArrayData = {
    val out = shingleSet(tokens, gram)
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(arr)
  }
}
