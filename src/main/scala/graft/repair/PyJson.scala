package graft.repair

import scala.collection.mutable

/** Python-`json`-compatible serializer and strict parser.
  *
  * `dumps` reproduces CPython `json.dumps(..., ensure_ascii=True)` byte for
  * byte: ", "/": " separators, \uXXXX escapes for non-ASCII, shortest
  * round-trip float repr with Python's fixed/scientific threshold, arbitrary
  * precision ints. `loads`/`rawDecode` mirror CPython's accepted grammar
  * (incl. NaN/Infinity literals, strict control-char rejection) so the
  * repair engine's fast path accepts exactly what the reference's fast path
  * accepts (json_repair.py:167-168).
  */
object PyJson {

  // ---- dumps --------------------------------------------------------------

  def dumps(v: JsonValue): String = dumps(v, ensureAscii = true, indent = None)

  /** Full CPython json.dumps surface: `ensure_ascii` and `indent`. */
  def dumps(v: JsonValue, ensureAscii: Boolean, indent: Option[Int]): String = {
    val sb = new StringBuilder
    indent match {
      case None => write(sb, v, ensureAscii)
      case Some(n) => writeIndented(sb, v, ensureAscii, math.max(0, n), 0)
    }
    sb.toString
  }

  private def writeIndented(sb: StringBuilder, v: JsonValue, ea: Boolean, n: Int, level: Int): Unit = {
    def pad(l: Int): String = "\n" + (" " * (n * l))
    v match {
      case JArr(xs) if xs.nonEmpty =>
        sb.append('[')
        xs.zipWithIndex.foreach { case (x, i) =>
          if (i > 0) sb.append(',')
          sb.append(pad(level + 1))
          writeIndented(sb, x, ea, n, level + 1)
        }
        sb.append(pad(level)).append(']')
      case JObj(fs) if fs.nonEmpty =>
        sb.append('{')
        var i = 0
        fs.foreach { case (k, x) =>
          if (i > 0) sb.append(',')
          i += 1
          sb.append(pad(level + 1))
          writeString(sb, k, ea)
          sb.append(": ")
          writeIndented(sb, x, ea, n, level + 1)
        }
        sb.append(pad(level)).append('}')
      case other => write(sb, other, ea)
    }
  }

  private def write(sb: StringBuilder, v: JsonValue, ensureAscii: Boolean = true): Unit = v match {
    case JNull => sb.append("null")
    case JBool(true) => sb.append("true")
    case JBool(false) => sb.append("false")
    case JInt(i) => sb.append(i.toString)
    case JFloat(d) => sb.append(floatRepr(d))
    case JStr(s) => writeString(sb, s, ensureAscii)
    case JArr(xs) =>
      sb.append('[')
      var first = true
      xs.foreach { x =>
        if (!first) sb.append(", ")
        first = false
        write(sb, x, ensureAscii)
      }
      sb.append(']')
    case JObj(fields) =>
      sb.append('{')
      var first = true
      fields.foreach { case (k, x) =>
        if (!first) sb.append(", ")
        first = false
        writeString(sb, k, ensureAscii)
        sb.append(": ")
        write(sb, x, ensureAscii)
      }
      sb.append('}')
  }

  private def writeString(sb: StringBuilder, s: String, ensureAscii: Boolean = true): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c if c > 0x7E && ensureAscii => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  /** CPython float repr: shortest decimal string that round-trips, rendered
    * fixed when the decimal exponent is in [-4, 16), else scientific with a
    * signed two-digit-minimum exponent. */
  def floatRepr(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isPosInfinity) return "Infinity"
    if (d.isNegInfinity) return "-Infinity"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    // fast path: whole values in the fixed-notation range need no search
    val absD = math.abs(d)
    if (d == math.rint(d) && absD < 1e16) {
      val asLong = d.toLong
      if (asLong.toDouble == d) return asLong.toString + ".0"
    }
    // shortest digit string: binary-search the minimal precision that
    // round-trips (monotone in p), 5 formats worst case instead of 17
    var lo = 1
    var hi = 17
    while (lo < hi) {
      val mid = (lo + hi) / 2
      val cand = String.format("%." + (mid - 1) + "e", Double.box(absD))
      if (cand.toDouble == absD) hi = mid else lo = mid + 1
    }
    val sci = String.format("%." + (lo - 1) + "e", Double.box(absD))
    // sci looks like "d.dddde±XX" (or "de±XX" for p=1)
    val Array(mant, expStr) = sci.split("e")
    val exp = expStr.toInt
    val digits = mant.replace(".", "")
    val neg = if (d < 0) "-" else ""
    if (exp >= -4 && exp < 16) {
      // fixed-point
      if (exp >= digits.length - 1) {
        neg + digits + "0" * (exp - (digits.length - 1)) + ".0"
      } else if (exp >= 0) {
        neg + digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
      } else {
        neg + "0." + "0" * (-exp - 1) + digits
      }
    } else {
      val m = if (digits.length == 1) digits else digits.substring(0, 1) + "." + digits.substring(1)
      val sign = if (exp < 0) "-" else "+"
      val eAbs = math.abs(exp)
      val eStr = if (eAbs < 10) "0" + eAbs else eAbs.toString
      neg + m + "e" + sign + eStr
    }
  }

  // ---- strict parser (CPython json.loads grammar) -------------------------

  final class JsonError(msg: String) extends RuntimeException(msg)

  /** Full-string parse: value with surrounding whitespace only. */
  def loads(s: CharSequence): Option[JsonValue] =
    try {
      val p = new StrictParser(s)
      p.skipWs()
      val v = p.parseValue()
      p.skipWs()
      if (p.i != s.length) None else Some(v)
    } catch { case _: JsonError | _: StringIndexOutOfBoundsException => None }

  /** Prefix parse from `from` (CPython `raw_decode`): returns value + end
    * index; no leading-whitespace skip, trailing garbage permitted. */
  def rawDecode(s: CharSequence, from: Int): Option[(JsonValue, Int)] =
    try {
      val p = new StrictParser(s)
      p.i = from
      val v = p.parseValue()
      Some((v, p.i))
    } catch { case _: JsonError | _: StringIndexOutOfBoundsException => None }

  private final class StrictParser(s: CharSequence) {
    var i = 0
    private def err(): Nothing = throw new JsonError(s"bad json at $i")
    private def ch: Char = if (i < s.length) s.charAt(i) else err()

    def skipWs(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' || s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1

    def parseValue(): JsonValue = {
      skipWs()
      ch match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JStr(parseString())
        case 't' => expect("true"); JBool(true)
        case 'f' => expect("false"); JBool(false)
        case 'n' =>
          // 'null' or CPython's NaN (starts with 'N' capital — handled below)
          expect("null"); JNull
        case 'N' => expect("NaN"); JFloat(Double.NaN)
        case 'I' => expect("Infinity"); JFloat(Double.PositiveInfinity)
        case '-' if i + 1 < s.length && s.charAt(i + 1) == 'I' =>
          i += 1; expect("Infinity"); JFloat(Double.NegativeInfinity)
        case c if c == '-' || (c >= '0' && c <= '9') => parseNumber()
        case _ => err()
      }
    }

    private def expect(lit: String): Unit = {
      if (i + lit.length > s.length || s.subSequence(i, i + lit.length).toString != lit) err()
      i += lit.length
    }

    private def parseObject(): JsonValue = {
      i += 1 // {
      val m = mutable.LinkedHashMap.empty[String, JsonValue]
      skipWs()
      if (ch == '}') { i += 1; return JObj(m) }
      while (true) {
        skipWs()
        if (ch != '"') err()
        val k = parseString()
        skipWs()
        if (ch != ':') err()
        i += 1
        m(k) = parseValue()
        skipWs()
        ch match {
          case ',' => i += 1
          case '}' => i += 1; return JObj(m)
          case _ => err()
        }
      }
      JObj(m)
    }

    private def parseArray(): JsonValue = {
      i += 1 // [
      val buf = mutable.ArrayBuffer.empty[JsonValue]
      skipWs()
      if (ch == ']') { i += 1; return JArr(buf) }
      while (true) {
        buf += parseValue()
        skipWs()
        ch match {
          case ',' => i += 1
          case ']' => i += 1; return JArr(buf)
          case _ => err()
        }
      }
      JArr(buf)
    }

    private def parseString(): String = {
      i += 1 // "
      val sb = new StringBuilder
      while (true) {
        val c = ch
        if (c == '"') { i += 1; return sb.toString }
        if (c == '\\') {
          i += 1
          ch match {
            case '"' => sb.append('"'); i += 1
            case '\\' => sb.append('\\'); i += 1
            case '/' => sb.append('/'); i += 1
            case 'b' => sb.append('\b'); i += 1
            case 'f' => sb.append('\f'); i += 1
            case 'n' => sb.append('\n'); i += 1
            case 'r' => sb.append('\r'); i += 1
            case 't' => sb.append('\t'); i += 1
            case 'u' =>
              if (i + 5 > s.length) err()
              val hex = s.subSequence(i + 1, i + 5).toString
              if (!hex.forall(h => "0123456789abcdefABCDEF".indexOf(h) >= 0)) err()
              sb.append(Integer.parseInt(hex, 16).toChar)
              i += 5
            case _ => err()
          }
        } else if (c < 0x20) err() // strict mode: raw control chars rejected
        else { sb.append(c); i += 1 }
      }
      sb.toString
    }

    private def parseNumber(): JsonValue = {
      val start = i
      if (ch == '-') i += 1
      if (ch == '0') i += 1
      else if (ch >= '1' && ch <= '9') { while (i < s.length && s.charAt(i).isDigit) i += 1 }
      else err()
      var isFloat = false
      if (i < s.length && s.charAt(i) == '.') {
        isFloat = true
        i += 1
        if (!(i < s.length && s.charAt(i).isDigit)) err()
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        isFloat = true
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (!(i < s.length && s.charAt(i).isDigit)) err()
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      val text = s.subSequence(start, i).toString
      if (isFloat) JFloat(text.toDouble) else JInt(BigInt(text))
    }
  }
}
