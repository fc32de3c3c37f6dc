package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 64-bit SimHash over a token array, keyed on md5: each
  * token's hash is the first 64 bits (16 hex chars) of its md5 digest;
  * each bit votes ±1; the fingerprint is the sign vector, emitted as a
  * 16-char lowercase hex string (MSB-first, matching the md5 hex prefix
  * layout), so the DuckDB oracle can recompute it bit-for-bit from
  * `SUBSTR(MD5(token), 1, 16)`.
  *
  * The xxhash64-keyed sibling (`Simhash64Expr`) is ~3x faster per token
  * and is the 100 TB production fingerprint; this one exists where
  * cross-engine reproducibility of the fingerprint matters (oracle
  * gates, mixed-engine pipelines). Both are one-pass, codegen'd.
  */
case class SimhashMd5Expr(child: Expression) extends UnaryExpression
    with Serializable {

  override def prettyName: String = "simhash_md5"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5 requires array<string>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashMd5Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.SimhashMd5Expr.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashMd5Expr {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): UTF8String = {
    // MessageDigest is not thread-safe and not free to construct; one per
    // call is fine (the call operates on a whole token array, not a token)
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val digest = md.digest(tokens.getUTF8String(i).getBytes)
        // first 8 digest bytes, big-endian == first 16 hex chars of md5
        var h = 0L
        var b = 0
        while (b < 8) { h = (h << 8) | (digest(b) & 0xffL); b += 1 }
        var j = 0
        while (j < 64) {
          // bit j counted from the MSB, matching hex-string order
          if (((h >>> (63 - j)) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Char](16)
    var d = 0
    while (d < 16) {
      var v = 0
      var k = 0
      while (k < 4) {
        if (votes(d * 4 + k) > 0) v |= 1 << (3 - k)
        k += 1
      }
      out(d) = hexDigits(v)
      d += 1
    }
    UTF8String.fromString(new String(out))
  }
}
