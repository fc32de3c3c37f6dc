package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** General .NET numeric formatting as a native codegen expression: the
  * format string is a PLAN-TIME constant ([[graft.functions.NetFormat]]
  * parse-validates it once, loudly), so each row pays exactly one
  * static render call inside whole-stage codegen — the fallback arm of
  * `RefFunctions.formatNet` for masks its expression mappings don't
  * cover (`Methods/String.cs:224` FORMAT parity).
  */
case class NetFormatExpr(child: Expression, fmt: String)
    extends UnaryExpression with Serializable {

  override def prettyName: String = "net_format"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"net_format requires double, got ${t.simpleString(10)}")
  }

  @transient private lazy val fmtU = UTF8String.fromString(fmt)

  override def nullSafeEval(input: Any): Any =
    graft.functions.NetFormat.formatDouble(input.asInstanceOf[Double], fmtU)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("netFormatFmt",
      UTF8String.fromString(fmt), "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.NetFormat.formatDouble($a, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
