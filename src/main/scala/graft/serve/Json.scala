package graft.serve

/** Minimal JDK-only JSON codec for the HTTP facade (no new deps allowed).
  * Rendering covers the value shapes the API returns (rows of catalog
  * tables); parsing covers the request bodies the reference accepts
  * (postman_api_guide.md — objects, arrays, strings, numbers, booleans).
  */
object Json {

  /** Ordered JSON object — field order is part of the reference's observable
    * response shape (web_scheduler.py:5415-5423 envelope). */
  final case class JObj(fields: Seq[(String, Any)])
  def obj(fields: (String, Any)*): JObj = JObj(fields)

  private val tsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  def render(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => render(x)
    case JObj(fs) =>
      fs.map { case (k, fv) => quote(k) + ":" + render(fv) }.mkString("{", ",", "}")
    case m: scala.collection.Map[_, _] =>
      m.toSeq.map { case (k, fv) => quote(k.toString) + ":" + render(fv) }
        .mkString("{", ",", "}")
    case s: String => quote(s)
    case b: Boolean => b.toString
    case ts: java.sql.Timestamp => quote(tsFmt.format(ts.toInstant))
    case d: java.sql.Date => quote(d.toString)
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double =>
      // JSON has no NaN/Infinity literals — a bare `NaN` would break every
      // client parser. Python's json.dumps emits them (non-standard); the
      // safe wire value is null.
      if (d.isNaN || d.isInfinite) "null"
      else if (d == d.floor) d.toLong.toString else d.toString
    case f: Float => render(f.toDouble)
    case bd: BigDecimal => bd.toString
    case bd: java.math.BigDecimal => bd.toString
    case xs: Seq[_] => xs.map(render).mkString("[", ",", "]")
    case xs: Array[_] => xs.map(render).mkString("[", ",", "]")
    case other => quote(other.toString)
  }

  /** Recursive-descent parse: objects → Map[String,Any], arrays →
    * Vector[Any], numbers → Long (integral) or Double, plus String/Boolean/
    * null. Throws IllegalArgumentException on malformed input. */
  def parse(s: String): Any = {
    val p = new Parser(s)
    val v = p.value()
    p.ws()
    if (!p.eof) fail(s"trailing content at ${p.pos}")
    v
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed JSON: $msg")

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(pos) != c) fail(s"expected '$c' at $pos")
      pos += 1
    }

    def value(): Any = {
      ws()
      if (eof) fail("unexpected end")
      s.charAt(pos) match {
        case '{' => objValue()
        case '[' => arrValue()
        case '"' => strValue()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _   => numValue()
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, pos)) fail(s"bad literal at $pos")
      pos += word.length; v
    }

    private def objValue(): Map[String, Any] = {
      expect('{'); ws()
      if (!eof && s.charAt(pos) == '}') { pos += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws()
        val k = strValue()
        ws(); expect(':')
        b += k -> value()
        ws()
        if (eof) fail("unterminated object")
        s.charAt(pos) match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case c   => fail(s"unexpected '$c' at $pos")
        }
      }
      b.result()
    }

    private def arrValue(): Vector[Any] = {
      expect('['); ws()
      if (!eof && s.charAt(pos) == ']') { pos += 1; return Vector.empty }
      val b = Vector.newBuilder[Any]
      var done = false
      while (!done) {
        b += value()
        ws()
        if (eof) fail("unterminated array")
        s.charAt(pos) match {
          case ',' => pos += 1
          case ']' => pos += 1; done = true
          case c   => fail(s"unexpected '$c' at $pos")
        }
      }
      b.result()
    }

    private def strValue(): String = {
      expect('"')
      val b = new StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        s.charAt(pos) match {
          case '"' => pos += 1; return b.toString
          case '\\' =>
            pos += 1
            if (eof) fail("bad escape")
            s.charAt(pos) match {
              case '"'  => b.append('"');  pos += 1
              case '\\' => b.append('\\'); pos += 1
              case '/'  => b.append('/');  pos += 1
              case 'n'  => b.append('\n'); pos += 1
              case 'r'  => b.append('\r'); pos += 1
              case 't'  => b.append('\t'); pos += 1
              case 'b'  => b.append('\b'); pos += 1
              case 'f'  => b.append('\f'); pos += 1
              case 'u' =>
                if (pos + 5 > s.length) fail("bad unicode escape")
                b.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
                pos += 5
              case c => fail(s"bad escape '\\$c'")
            }
          case c => b.append(c); pos += 1
        }
      }
      throw new IllegalStateException // unreachable
    }

    private def numValue(): Any = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!eof && (s.charAt(pos).isDigit || "eE+-.".contains(s.charAt(pos)))) pos += 1
      val txt = s.substring(start, pos)
      if (txt.isEmpty) fail(s"expected value at $start")
      if (txt.exists(c => c == '.' || c == 'e' || c == 'E')) txt.toDouble
      else try txt.toLong catch { case _: NumberFormatException => txt.toDouble }
    }
  }
}
