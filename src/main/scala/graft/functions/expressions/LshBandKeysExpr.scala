package graft.functions.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native MinHash+LSH band keys over a token array: word
  * `gram`-gram shingles (distinct), `k` md5 min-wise hashes, `bands` band
  * keys — all inside a single codegen'd call.
  *
  * Exists because the composable form (transform/array_min/md5 higher-
  * order functions) cannot enter whole-stage codegen and interprets
  * millions of per-element expression trees (measured: the bucket stage
  * of q48 was ~4 s of a 5 s query; this expression does the same work in
  * one pass). Semantics are bit-identical to the composable pipeline the
  * DuckDB oracle replicates:
  *  - shingle i = tokens[i .. i+gram) joined by one space (concat_ws
  *    semantics: null elements skipped; empty token array yields one ""
  *    shingle), distinct
  *  - minhash s = lexicographic min over shingles of md5hex(s + "|" + sh)
  *  - band key b = md5hex(b + "|" + mh(b*r) + "," + ... + mh(b*r+r-1))
  */
case class LshBandKeysExpr(child: Expression, gram: Int, k: Int, bands: Int)
    extends UnaryExpression with Serializable {

  require(k % bands == 0, s"k=$k not divisible by bands=$bands")

  override def prettyName: String = "lsh_band_keys"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_band_keys requires array<string>, got ${t.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    LshBandKeysExpr.compute(input.asInstanceOf[ArrayData], gram, k, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.expressions.LshBandKeysExpr.compute($a, $gram, $k, $bands)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBandKeysExpr {

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = hexDigits((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, gram: Int, k: Int, bands: Int): ArrayData = {
    // single source of truth for window semantics: WordShinglesExpr's core
    val shingles = WordShinglesExpr.shingleSet(tokens, gram)
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](k)
    val it = shingles.iterator()
    while (it.hasNext) {
      val sh = it.next()
      var s = 0
      while (s < k) {
        md.reset()
        md.update((s + "|" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val h = hex(md.digest())
        if (mins(s) == null || h.compareTo(mins(s)) < 0) mins(s) = h
        s += 1
      }
    }
    val rpb = k / bands
    val keys = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder
      sb.append(b).append('|')
      var r = 0
      while (r < rpb) {
        // concat_ws(",") over the band's minhashes skips null (the
        // no-shingles case contributes nothing, like the composable form)
        if (mins(b * rpb + r) != null) {
          if (r > 0) sb.append(',')
          sb.append(mins(b * rpb + r))
        }
        r += 1
      }
      md.reset()
      md.update(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      keys(b) = UTF8String.fromString(hex(md.digest()))
      b += 1
    }
    new GenericArrayData(keys)
  }
}
