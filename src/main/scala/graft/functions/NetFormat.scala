package graft.functions

import java.math.{BigDecimal => JBD, RoundingMode}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.unsafe.types.UTF8String

/** A small .NET numeric-format interpreter — the general surface of the
  * reference's FORMAT (`Methods/String.cs:224` is literally
  * `string.Format("{0:" + fmt + "}", value)`), covering what the
  * expression-level mappings in [[RefFunctions.formatNet]] do not:
  * the remaining STANDARD specifiers (G, R, C) and ARBITRARY custom
  * masks (sections `pos;neg;zero`, grouping, scaling commas, `%`/`‰`,
  * quoted literals, interleaved text). Invariant culture throughout;
  * rounding is away-from-zero, matching .NET's ToString midpoint rule.
  *
  * Format strings are plan-time constants: [[parse]] compiles each once
  * (cached), and the per-row entry points ([[formatLong]] /
  * [[formatDouble]], invoked through codegen `StaticInvoke`) only
  * render. Unsupported constructs throw AT PARSE TIME, so a bad format
  * fails the query plan loudly, never a task.
  */
object NetFormat {

  // ---- per-row entry points (codegen StaticInvoke targets) ----------------

  def formatLong(v: Long, fmt: UTF8String): UTF8String =
    UTF8String.fromString(render(new JBD(v), fmt.toString))

  def formatDouble(v: Double, fmt: UTF8String): UTF8String =
    UTF8String.fromString(
      if (v.isNaN) "NaN"
      else if (v.isPosInfinity) "Infinity"
      else if (v.isNegInfinity) "-Infinity"
      else render(new JBD(java.lang.Double.toString(v)), fmt.toString))

  def render(v: JBD, fmt: String): String = {
    val std = StdRe.findFirstMatchIn(fmt)
    if (std.isDefined) {
      val m = std.get
      val d = Option(m.group(2)).filter(_.nonEmpty).map(_.toInt)
      renderStd(v, m.group(1).charAt(0), d)
    } else renderCustom(v, parse(fmt))
  }

  private val StdRe = "^([DdNnFfEePpXxGgRrCc])(\\d*)$".r

  // ---- standard specifiers -------------------------------------------------

  private def renderStd(v: JBD, spec: Char, digits: Option[Int]): String =
    spec match {
      case 'D' | 'd' =>
        val l = v.setScale(0, RoundingMode.HALF_UP).longValueExact()
        val s = math.abs(l).toString
        val w = digits.getOrElse(1)
        (if (l < 0) "-" else "") +
          ("0" * math.max(0, w - s.length)) + s
      case 'F' | 'f' =>
        fixed(v, digits.getOrElse(2), grouped = false)
      case 'N' | 'n' =>
        fixed(v, digits.getOrElse(2), grouped = true)
      case 'E' | 'e' =>
        sci(v, digits.getOrElse(6), if (spec == 'E') 'E' else 'e', expMin = 3)
      case 'P' | 'p' =>
        fixed(v.multiply(new JBD(100)), digits.getOrElse(2),
          grouped = true) + " %"
      case 'X' | 'x' =>
        // fractional inputs round first (a raw longValueExact would
        // throw inside a TASK, violating the fail-at-plan contract)
        val h = java.lang.Long.toHexString(
          v.setScale(0, RoundingMode.HALF_UP).longValueExact())
        val w = digits.getOrElse(1)
        val padded = ("0" * math.max(0, w - h.length)) + h
        if (spec == 'X') padded.toUpperCase else padded
      case 'G' | 'g' =>
        general(v, digits.filter(_ > 0), upper = spec == 'G')
      case 'R' | 'r' =>
        // round-trip: the shortest decimal form (the JBD came from
        // Double.toString, already shortest)
        val s = v.stripTrailingZeros.toPlainString
        if (s.endsWith(".0")) s.dropRight(2) else s
      case 'C' | 'c' =>
        // invariant culture: ¤n,nnn.nn; negatives parenthesized
        val d = digits.getOrElse(2)
        val body = "¤" + fixed(v.abs, d, grouped = true)
        if (v.signum < 0) s"($body)" else body
    }

  private def fixed(v: JBD, decimals: Int, grouped: Boolean): String = {
    val r = v.setScale(decimals, RoundingMode.HALF_UP)
    val neg = r.signum < 0
    val plain = r.abs.toPlainString
    val (ip, dp) = plain.split("\\.") match {
      case Array(i, d) => (i, d)
      case Array(i) => (i, "")
    }
    val gi = if (grouped) group3(ip) else ip
    (if (neg) "-" else "") + gi + (if (decimals > 0) "." + dp else "")
  }

  private def sci(v: JBD, decimals: Int, e: Char, expMin: Int): String = {
    if (v.signum == 0)
      return "0." + ("0" * decimals) + e + "+" + ("0" * expMin)
    val neg = v.signum < 0
    val a = v.abs
    // exponent = digits before the point - 1 of the normalized form
    val exp = a.precision - a.scale - 1
    val mant = a.movePointLeft(exp).setScale(decimals, RoundingMode.HALF_UP)
    // rounding can carry the mantissa to 10.x — renormalize
    val (m2, e2) =
      if (mant.compareTo(JBD.TEN) >= 0)
        (mant.movePointLeft(1).setScale(decimals, RoundingMode.HALF_UP),
          exp + 1)
      else (mant, exp)
    val es = math.abs(e2).toString
    (if (neg) "-" else "") + m2.toPlainString + e +
      (if (e2 < 0) "-" else "+") +
      ("0" * math.max(0, expMin - es.length)) + es
  }

  private def general(v: JBD, sig: Option[Int], upper: Boolean): String = {
    if (v.signum == 0) return "0"
    val stripped = v.stripTrailingZeros
    val rounded = sig match {
      case Some(n) => stripped.round(new java.math.MathContext(n,
        RoundingMode.HALF_UP)).stripTrailingZeros
      case None => stripped
    }
    val exp = rounded.precision - rounded.scale - 1
    val limit = sig.getOrElse(15)
    if (exp >= -5 && exp < limit) {
      val s = rounded.toPlainString
      if (s.endsWith(".0")) s.dropRight(2) else s
    } else {
      // G scientific: exponent at least 2 digits
      val mantDigits = math.max(0, rounded.precision - 1)
      val base = sci(rounded, mantDigits, if (upper) 'E' else 'e', expMin = 2)
      // G trims the mantissa's trailing zeros (sci keeps fixed decimals)
      base.replaceAll("(\\.\\d*?)0+(?=[Ee])", "$1")
        .replaceAll("\\.(?=[Ee])", "")
    }
  }

  private def group3(digits: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = digits.length
    while (i < n) {
      if (i > 0 && (n - i) % 3 == 0) sb += ','
      sb += digits.charAt(i)
      i += 1
    }
    sb.toString
  }

  // ---- custom masks --------------------------------------------------------

  /** One compiled custom-mask section. */
  final case class Section(prefix: String, suffix: String,
      intMin: Int, intHas: Boolean, decMin: Int, decMax: Int,
      grouped: Boolean, scaleDiv: Int, pctScale: Int, literalOnly: Boolean)

  /** pos / neg / zero sections (.NET section rules). */
  final case class Spec(pos: Section, neg: Option[Section],
      zero: Option[Section])

  private val cache = new ConcurrentHashMap[String, Spec]()

  def parse(fmt: String): Spec = {
    val hit = cache.get(fmt)
    if (hit != null) return hit
    val sections = splitSections(fmt)
    require(sections.nonEmpty && sections.size <= 3,
      s"unsupported .NET format (1-3 sections): $fmt")
    val spec = Spec(parseSection(sections.head, fmt),
      sections.lift(1).map(parseSection(_, fmt)),
      sections.lift(2).map(parseSection(_, fmt)))
    if (cache.size > 4096) cache.clear()
    cache.put(fmt, spec)
    spec
  }

  /** Split on top-level ';' (quote-aware). */
  private def splitSections(fmt: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (quote != 0) { sb += c; if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') { quote = c; sb += c }
      else if (c == '\\' && i + 1 < fmt.length) {
        sb += c; sb += fmt.charAt(i + 1); i += 1
      }
      else if (c == ';') { out += sb.toString; sb.clear() }
      else sb += c
      i += 1
    }
    out += sb.toString
    out.toSeq
  }

  private def parseSection(s: String, whole: String): Section = {
    val pre = new StringBuilder
    val post = new StringBuilder
    var intMin = 0; var intHas = false
    var decMin = 0; var decMax = 0
    var grouped = false; var scaleDiv = 0; var pctScale = 0
    var inDec = false; var seenDigit = false
    var pendingCommas = 0
    def lit(c: Char): Unit = (if (seenDigit) post else pre) += c
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\'' | '"' =>
          val close = s.indexOf(c, i + 1)
          require(close > i, s"unterminated quote in .NET format: $whole")
          s.substring(i + 1, close).foreach(lit)
          i = close
        case '\\' if i + 1 < s.length =>
          lit(s.charAt(i + 1)); i += 1
        case '0' =>
          if (pendingCommas > 0) { grouped = true; pendingCommas = 0 }
          seenDigit = true
          if (inDec) { decMin += 1; decMax += 1 } else intMin += 1
          intHas = true
        case '#' =>
          if (pendingCommas > 0) { grouped = true; pendingCommas = 0 }
          seenDigit = true
          if (inDec) decMax += 1 else intHas = true
        case '.' if !inDec =>
          scaleDiv += pendingCommas; pendingCommas = 0
          inDec = true
        case ',' if seenDigit && !inDec =>
          // between digits => grouping; trailing (before '.' or end)
          // => scale /1000 each — resolved when the next token arrives
          pendingCommas += 1
        case '%' => pctScale += 2; lit('%')
        case '‰' => pctScale += 3; lit('‰')
        case 'E' | 'e'
            if i + 1 < s.length && "+-0".contains(s.charAt(i + 1)) =>
          throw new IllegalArgumentException(
            s"unsupported .NET format (custom scientific mask): $whole")
        case other => lit(other)
      }
      i += 1
    }
    scaleDiv += pendingCommas
    // a decimal point with no following digit renders nothing ("0.")
    Section(pre.toString, post.toString, intMin, intHas,
      decMin, decMax, grouped, scaleDiv, pctScale,
      literalOnly = !intHas && decMax == 0)
  }

  def renderCustom(v: JBD, spec: Spec): String = {
    val sec =
      if (v.signum < 0) spec.neg.getOrElse(spec.pos)
      else if (v.signum == 0) spec.zero.getOrElse(spec.pos)
      else spec.pos
    // a value routed to the NEG section renders its absolute value
    // (the section's literals carry the sign marks); a single-section
    // negative keeps the leading minus
    val ownMinus = v.signum < 0 && spec.neg.isEmpty
    val a0 = v.abs
    if (sec.literalOnly) return (if (ownMinus) "-" else "") +
      sec.prefix + sec.suffix
    val scaled = a0
      .scaleByPowerOfTen(sec.pctScale)
      .movePointLeft(3 * sec.scaleDiv)
    val r = scaled.setScale(sec.decMax, RoundingMode.HALF_UP)
    val plain = r.toPlainString
    val (ip0, dp0) = plain.split("\\.") match {
      case Array(ipp, dpp) => (ipp, dpp)
      case Array(ipp) => (ipp, "")
    }
    // integer digits: pad to intMin; "#"-only masks render ZERO int
    // part as empty (".45" / "" shapes, per .NET)
    var ip = ip0.dropWhile(_ == '0')
    if (ip.length < sec.intMin)
      ip = ("0" * (sec.intMin - ip.length)) + ip
    // decimals: keep at least decMin, trim optional trailing zeros
    var dp = dp0
    while (dp.length > sec.decMin && dp.nonEmpty && dp.last == '0')
      dp = dp.dropRight(1)
    val gi = if (sec.grouped) group3(ip) else ip
    val num = gi + (if (dp.nonEmpty) "." + dp else "")
    val isZero = r.signum == 0 && gi.isEmpty && dp.forall(_ == '0')
    val minus = if (ownMinus && !isZero) "-" else ""
    minus + sec.prefix + num + sec.suffix
  }
}
