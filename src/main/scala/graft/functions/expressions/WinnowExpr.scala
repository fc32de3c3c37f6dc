package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native winnowing (Schleimer et al. 2003): char `k`-gram md5
  * prefixes, sliding `w`-window minima, distinct — the whole per-document
  * fingerprint set in a single codegen'd call over the text column.
  *
  * Exists because the composable form (posexplode grams → md5 →
  * re-aggregate → per-doc window HOF) pays a corpus-wide shuffle plus
  * ~1.5 M interpreted lambda evaluations at sf0.1 (higher-order
  * functions are CodegenFallback); this expression keeps winnowing a
  * pure map — no shuffle at any corpus size — and runs the O(len·w)
  * scan as a tight JVM loop. Semantics are bit-identical to the
  * composable pipeline the DuckDB oracle replicates:
  *   - gram i (1-based, i = 1 .. max(len-k+1, 1)) = substring(text, i, k)
  *     (SQL substring: clamped at the end, so short docs yield one
  *     partial gram)
  *   - hash = first 12 hex chars of md5(utf8(gram)) — fixed-width
  *     lowercase hex, which orders identically to the numeric value
  *   - window j = 1 .. max(nh-w+1, 1): min over hashes[j .. j+w-1]
  *     (clamped; a doc with fewer than w grams keeps one all-hash
  *     window), then distinct
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {

  require(k >= 1 && w >= 1, s"k=$k and w=$w must be >= 1")

  override def prettyName: String = "winnow_fps"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires string, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.WinnowExpr.compute($a, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpr {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Shared by interpreted eval and generated code.
    *
    * Hot-loop discipline: md5 digests byte SLICES of the utf8 buffer
    * (char→byte offsets precomputed once, so SQL-substring semantics —
    * 1-based, end-clamped, code-point-aware — hold for multi-byte
    * text), and window minima compare the first 6 digest bytes as
    * UNSIGNED longs (fixed-width lowercase hex orders identically);
    * only the selected ~2/(w+1) minima are ever rendered to hex. No
    * per-gram object allocation beyond the digest's own 16-byte result.
    */
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    // byte offset of each char (offsets(c) .. offsets(c+1) is char c)
    val len = text.numChars()
    val offsets = new Array[Int](len + 1)
    var c = 0
    var b = 0
    while (c < len) {
      offsets(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offsets(len) = bytes.length

    val nh = math.max(len - k + 1, 1)
    val md = MessageDigest.getInstance("MD5")
    val hs = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      val from = offsets(i)
      val to = offsets(math.min(i + k, len))
      md.reset()
      md.update(bytes, from, to - from)
      val d = md.digest()
      hs(i) = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
        ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
        ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
      i += 1
    }
    val nw = math.max(nh - w + 1, 1)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nw) {
      val end = math.min(j + w, nh)
      var m = hs(j)
      var t = j + 1
      while (t < end) {
        // 48-bit values: plain signed compare == unsigned compare
        if (hs(t) < m) m = hs(t)
        t += 1
      }
      seen.add(m)
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(hex12OfLong(it.next().longValue()))
      o += 1
    }
    new GenericArrayData(out)
  }

  /** 48-bit value back to its 12 lowercase hex chars. */
  private def hex12OfLong(v: Long): String = {
    val out = new Array[Char](12)
    var i = 0
    while (i < 12) {
      out(i) = hexDigits(((v >>> (4 * (11 - i))) & 0xf).toInt)
      i += 1
    }
    new String(out)
  }
}
