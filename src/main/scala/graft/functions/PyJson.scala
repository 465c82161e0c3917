package graft.functions

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node._
import com.fasterxml.jackson.core.JsonParser
import scala.jdk.CollectionConverters._

/** JSON utilities reproducing the reference's Python-side semantics
  * (`/root/reference/dbsink/maps.py:13-19`, `tables.py:65-79,128-147`):
  *
  *  - parse accepting bare `NaN`/`Infinity` tokens (simplejson default);
  *  - canonical re-serialization with NaN/Infinity scrubbed to null
  *    (`json.dumps(..., ignore_nan=True)`);
  *  - Python-`str()`-compatible rendering of arbitrary JSON values
  *    (`True`, `None`, `[33, 1]`, `1569230478.0`, `{'a': False}`) — the
  *    reference stores these reprs into HSTORE, and its tests pin them;
  *  - the lenient "expand embedded JSON" decode: try JSON, then a
  *    Python-literal dialect (single quotes, True/False/None, tuples).
  */
object PyJson {

  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS, true)
    // Python's json.loads raises on trailing text ("123 Main St" is NOT a
    // number); without this, speculative embedded decode (T5) silently
    // truncates free-text values to their numeric/JSON prefix.
    m.configure(DeserializationFeature.FAIL_ON_TRAILING_TOKENS, true)
    m
  }

  def parse(s: String): JsonNode = mapper.readTree(s)

  /** True when the tree holds any non-finite double (alloc-free check). */
  private def hasNonFinite(n: JsonNode): Boolean = n match {
    case d: DoubleNode => d.doubleValue.isNaN || d.doubleValue.isInfinite
    case f: FloatNode  => f.floatValue.isNaN || f.floatValue.isInfinite
    case o: ObjectNode =>
      val it = o.elements()
      while (it.hasNext) if (hasNonFinite(it.next())) return true
      false
    case a: ArrayNode =>
      val it = a.elements()
      while (it.hasNext) if (hasNonFinite(it.next())) return true
      false
    case _ => false
  }

  /** NaN/Infinity → null, recursively (reference `payload_parse`). The
    * common all-finite tree is returned AS-IS (and scrubbed copies share
    * untouched subtrees) — the deep copy only happens where there is
    * actually something to scrub, since payload canonicalization runs per
    * message. Callers must therefore treat both the result and the input
    * as immutable after the call (capture any derived views first). */
  def scrubNonFinite(n: JsonNode): JsonNode =
    if (!hasNonFinite(n)) n else scrubCopy(n)

  private def scrubCopy(n: JsonNode): JsonNode = n match {
    case d: DoubleNode if d.doubleValue.isNaN || d.doubleValue.isInfinite =>
      NullNode.getInstance
    case f: FloatNode if f.floatValue.isNaN || f.floatValue.isInfinite =>
      NullNode.getInstance
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      o.fields.asScala.foreach(e => out.set[JsonNode](e.getKey, scrubNonFinite(e.getValue)))
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.elements.asScala.foreach(e => out.add(scrubNonFinite(e)))
      out
    case other => other
  }

  /** Canonical JSON text of a scrubbed tree (payload column). */
  def canonical(n: JsonNode): String = mapper.writeValueAsString(scrubNonFinite(n))

  /** Python `repr(float)` — shortest round-trip decimal, positional for
    * exponents in [-4, 16), else `1e+17`-style scientific. */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    val abs = math.abs(d)
    val sign = if (d < 0 || (d == 0.0 && 1.0 / d < 0)) "-" else ""
    if (abs == 0.0) return sign + "0.0"
    // Shortest round-trip decimal: JDK 17's Double.toString over-lengthens
    // (fixed only in JDK 19+), so probe precision like CPython — seeded
    // from the JDK repr's digit count and walking DOWN (round-trip success
    // is monotone in precision), which needs ~2 format calls per value
    // instead of ~16 ascending (this is the faithful layer's hot loop:
    // every HSTORE float goes through here). Locale.ROOT: a comma-decimal
    // default locale would otherwise emit "2,9e+01" and break the probe.
    def fmt(p: Int): String =
      String.format(java.util.Locale.ROOT, "%." + p + "e", java.lang.Double.valueOf(abs))
    val jdk = java.lang.Double.toString(abs)
    var p = {
      var digits = 0
      var i = 0
      while (i < jdk.length && jdk.charAt(i) != 'E') {
        if (jdk.charAt(i) >= '0' && jdk.charAt(i) <= '9') digits += 1
        i += 1
      }
      math.max(0, math.min(digits - 1, 17))
    }
    var jstr = fmt(p)
    if (jstr.toDouble != abs) {
      // JDK repr digit count insufficient (shouldn't happen) — walk up.
      while (jstr.toDouble != abs && p < 17) { p += 1; jstr = fmt(p) }
    } else {
      var tryP = p - 1
      var continue = tryP >= 0
      while (continue) {
        val cand = fmt(tryP)
        if (cand.toDouble == abs) { jstr = cand; tryP -= 1; continue = tryP >= 0 }
        else continue = false
      }
    }
    // form: d[.ddd]e±XX
    val Array(m, e) = jstr.split("e")
    var digits: String = m.replace(".", "")
    var exp10: Int = e.toInt
    while (digits.length > 1 && digits.charAt(0) == '0') {
      digits = digits.substring(1); exp10 -= 1
    }
    if (digits == "0") return sign + "0.0"
    val trimmed0 = digits.reverse.dropWhile(_ == '0').reverse
    val trimmed = if (trimmed0.isEmpty) "0" else trimmed0
    // value = 0.trimmed * 10^(exp10+1), with one leading digit before point
    if (exp10 >= -4 && exp10 < 16) {
      if (exp10 >= trimmed.length - 1) {
        // integral-valued: pad zeros, append .0
        sign + trimmed.padTo(exp10 + 1, '0') + ".0"
      } else if (exp10 >= 0) {
        val (i, f) = trimmed.splitAt(exp10 + 1)
        s"$sign$i.$f"
      } else {
        sign + "0." + ("0" * (-exp10 - 1)) + trimmed
      }
    } else {
      val mant =
        if (trimmed.length == 1) trimmed
        else trimmed.head + "." + trimmed.tail
      val es = if (exp10 < 0) f"-${-exp10}%02d" else f"+$exp10%02d"
      s"$sign${mant}e$es"
    }
  }

  /** Python `str()` of a JSON value (reference stringifies non-strings with
    * `str(obj)` before HSTORE insert — `tables.py:128-147`). */
  def pyStr(n: JsonNode): String = n match {
    case s: TextNode    => s.textValue
    case b: BooleanNode => if (b.booleanValue) "True" else "False"
    case _: NullNode    => "None"
    case v if v.isIntegralNumber => v.bigIntegerValue.toString
    case v if v.isFloatingPointNumber => pyFloatRepr(v.doubleValue)
    case a: ArrayNode =>
      a.elements.asScala.map(pyRepr).mkString("[", ", ", "]")
    case o: ObjectNode =>
      o.fields.asScala
        .map(e => s"'${e.getKey}': ${pyRepr(e.getValue)}")
        .mkString("{", ", ", "}")
    case other => other.toString
  }

  /** Python `repr()` — like pyStr but strings get quotes, with CPython's
    * quote choice: double quotes when the string contains `'` but no `"`. */
  def pyRepr(n: JsonNode): String = n match {
    case s: TextNode =>
      val t = s.textValue.replace("\\", "\\\\")
      if (t.contains("'") && !t.contains("\"")) "\"" + t + "\""
      else "'" + t.replace("'", "\\'") + "'"
    case other => pyStr(other)
  }

  /** Lenient embedded-JSON expansion (reference `expand_json_objects`):
    * strict JSON first, then the Python-literal dialect. Returns None when
    * the string is not decodable (caller keeps the raw string). Bare
    * primitives are valid decodes for json.loads ("33" → 33, "true" → true),
    * matching the reference, which flattens whatever json.loads returns. */
  def expandEmbedded(s: String): Option[JsonNode] =
    try Some(mapper.readTree(s.trim match { case "" => return None; case t => t }))
    catch {
      case _: Exception =>
        try Some(PyLiteral.parse(s))
        catch { case _: Exception => None }
    }
}

/** Minimal Python-literal parser (`ast.literal_eval` subset): dicts, lists,
  * tuples, strings ('…' or "…"), numbers, True/False/None. Produces a
  * Jackson tree so downstream flatten/stringify is uniform.
  * Cites `/root/reference/dbsink/tables.py:65-79`. */
object PyLiteral {
  import PyJson.mapper

  def parse(s: String): JsonNode = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, "trailing data")
    v
  }

  private final class Parser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    private def peek: Char = s.charAt(i)
    private def expect(c: Char): Unit = {
      require(!eof && peek == c, s"expected $c at $i"); i += 1
    }

    def value(): JsonNode = {
      skipWs()
      require(!eof, "unexpected end")
      peek match {
        case '{' => obj()
        case '[' => arr(']')
        case '(' => arr(')')
        case '\'' | '"' => new TextNode(str())
        case c if c == '-' || c == '+' || c.isDigit || c == '.' => num()
        case _ => word()
      }
    }

    private def obj(): JsonNode = {
      expect('{'); skipWs()
      val out = mapper.createObjectNode()
      if (!eof && peek == '}') { i += 1; return out }
      while (true) {
        skipWs()
        val k = peek match {
          case '\'' | '"' => str()
          case _ => throw new IllegalArgumentException("dict key must be a string")
        }
        skipWs(); expect(':')
        out.set[JsonNode](k, value())
        skipWs()
        if (!eof && peek == ',') { i += 1 } else { expect('}'); return out }
        skipWs()
        if (!eof && peek == '}') { i += 1; return out } // trailing comma
      }
      out
    }

    private def arr(close: Char): JsonNode = {
      i += 1; skipWs()
      val out = mapper.createArrayNode()
      if (!eof && peek == close) { i += 1; return out }
      while (true) {
        out.add(value())
        skipWs()
        if (!eof && peek == ',') { i += 1 } else { expect(close); return out }
        skipWs()
        if (!eof && peek == close) { i += 1; return out }
      }
      out
    }

    private def str(): String = {
      val quote = peek; i += 1
      val sb = new StringBuilder
      while (!eof && peek != quote) {
        if (peek == '\\' && i + 1 < s.length) {
          i += 1
          sb.append(s.charAt(i) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case '\\' => '\\'; case '\'' => '\''; case '"' => '"'
            case other => other
          })
        } else sb.append(peek)
        i += 1
      }
      expect(quote)
      sb.toString
    }

    private def num(): JsonNode = {
      val start = i
      if (peek == '-' || peek == '+') i += 1
      while (!eof && (peek.isDigit || peek == '.' || peek == 'e' || peek == 'E' ||
        ((peek == '-' || peek == '+') && (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
      val t = s.substring(start, i)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) new DoubleNode(t.toDouble)
      else {
        // Python rejects leading-zero integer literals ("0199" is a
        // SyntaxError, not 199) — keep parity so such strings stay strings.
        val body = t.dropWhile(c => c == '-' || c == '+')
        require(!(body.length > 1 && body.charAt(0) == '0'), "leading zero")
        new LongNode(t.toLong)
      }
    }

    private def word(): JsonNode = {
      val start = i
      while (!eof && peek.isLetter) i += 1
      s.substring(start, i) match {
        case "True"  => BooleanNode.TRUE
        case "False" => BooleanNode.FALSE
        case "None"  => NullNode.getInstance
        case w => throw new IllegalArgumentException(s"unknown literal: $w")
      }
    }
  }
}
