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

  /** NaN/Infinity → null, recursively (reference `payload_parse`), in ONE
    * pass with structural sharing: a clean subtree is returned AS-IS — the
    * copy allocates only along paths that actually hold a non-finite value
    * (payload canonicalization runs per message, and almost all trees are
    * clean). Callers must therefore treat both the result and the input as
    * immutable after the call (capture any derived views first). */
  def scrubNonFinite(n: JsonNode): JsonNode = n match {
    case d: DoubleNode if d.doubleValue.isNaN || d.doubleValue.isInfinite =>
      NullNode.getInstance
    case f: FloatNode if f.floatValue.isNaN || f.floatValue.isInfinite =>
      NullNode.getInstance
    case o: ObjectNode =>
      // alloc-free until the first changed child: only then build the
      // copy, re-walking the already-visited (unchanged) prefix
      var out: ObjectNode = null
      var idx = 0
      val it = o.fields()
      while (it.hasNext) {
        val e = it.next()
        val s = scrubNonFinite(e.getValue)
        if ((out eq null) && !(s eq e.getValue)) {
          out = mapper.createObjectNode()
          val pre = o.fields()
          var j = 0
          while (j < idx) { val pe = pre.next(); out.set[JsonNode](pe.getKey, pe.getValue); j += 1 }
        }
        if (out ne null) out.set[JsonNode](e.getKey, s)
        idx += 1
      }
      if (out eq null) o else out
    case a: ArrayNode =>
      var out: ArrayNode = null
      var idx = 0
      val it = a.elements()
      while (it.hasNext) {
        val e = it.next()
        val s = scrubNonFinite(e)
        if ((out eq null) && !(s eq e)) {
          out = mapper.createArrayNode()
          val pre = a.elements()
          var j = 0
          while (j < idx) { out.add(pre.next()); j += 1 }
        }
        if (out ne null) out.add(s)
        idx += 1
      }
      if (out eq null) a else out
    case other => other
  }

  /** Canonical JSON text of a scrubbed tree (payload column): minified,
    * insertion-ordered keys, doubles in CPython `repr` form — the reference
    * builds payloads with `json.dumps` (`tables.py:65-79`), whose float
    * rendering is CPython's shortest-round-trip repr, not Java's
    * `Double.toString` E-notation (`1e-07`, not `1.0E-7`). */
  def canonical(n: JsonNode): String = writeWith(scrubNonFinite(n), jsonPyFloat)

  /** Canonical form WITHOUT the non-finite scrub (same float policy):
    * StringMap parity — the reference's `json.dumps(value)` (simplejson,
    * `maps.py:151`) keeps NaN/Infinity as bare tokens. */
  def writePy(n: JsonNode): String = writeWith(n, jsonPyFloat)

  /** simplejson's float token: bare `NaN`/`Infinity`/`-Infinity` (the
    * json.dumps default), CPython repr for finite values. */
  private def jsonPyFloat(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isPosInfinity) "Infinity"
    else if (d.isNegInfinity) "-Infinity"
    else pyFloatRepr(d)

  /** Canonical JSON with ECMAScript/yyjson-style float rendering — the form
    * DuckDB's `json_extract` re-serialization produces. Exists solely as a
    * cross-engine verification twin (m6_payload): both engines render the
    * same shortest-round-trip digits, they differ only in notation cutoffs
    * (ES positional for 1e-6 ≤ |x| < 1e21, exponent unpadded and unsigned;
    * CPython positional for 1e-4 ≤ |x| < 1e16, exponent `e±DD`). */
  def canonicalEs(n: JsonNode): String = writeWith(scrubNonFinite(n), esFloatRepr)

  /** Serialize a tree through Jackson with doubles intercepted and written
    * raw via `fmt` (Jackson's own escaper still handles strings). The
    * delegate sees every structural write, so the underlying generator's
    * output context stays consistent and `writeRawValue` lands separators
    * correctly. */
  private def writeWith(n: JsonNode, fmt: Double => String): String = {
    val sw = new java.io.StringWriter
    val g = mapper.getFactory.createGenerator(sw)
    val pg = new com.fasterxml.jackson.core.util.JsonGeneratorDelegate(g) {
      override def writeNumber(v: Double): Unit = writeRawValue(fmt(v))
      override def writeNumber(v: Float): Unit = writeRawValue(fmt(v.toDouble))
    }
    mapper.writeTree(pg, n)
    pg.close()
    sw.toString
  }

  private val mcs: Array[java.math.MathContext] =
    Array.tabulate(19)(n => new java.math.MathContext(math.max(1, n), java.math.RoundingMode.HALF_EVEN))

  /** Mantissa digits (no sign) and decimal exponent of a positive
    * BigDecimal, normalized so value = d1.d2d3… × 10^exp10. */
  private def bdDigits(bd: java.math.BigDecimal): (String, Int) = {
    val ds = bd.unscaledValue.abs.toString
    (ds, ds.length - 1 - bd.scale)
  }

  /** Shortest round-trip decimal of a positive finite double, CPython-style:
    * returns (digits, exp10) with value = d1.d2d3… × 10^exp10 and trailing
    * zeros trimmed (see pyFloatRepr for the correctness argument). */
  private def shortestDigitsOf(abs: Double): (String, Int) = {
    // Shortest round-trip decimal, CPython-style: at each precision the
    // candidate is the CORRECTLY-ROUNDED (p+1)-digit decimal of the EXACT
    // binary value (BigDecimal, half-even — NOT a re-rounding of the
    // JDK-17 Double.toString digits, whose double rounding misses the
    // true shortest for ~0.2% of full-precision doubles). The probe MUST
    // ascend from 0 (round-trip success is not monotone in precision),
    // and when the nearest candidate fails, its decimal neighbors are
    // tried — at power-of-two boundaries the rounding interval is
    // asymmetric, so a round-tripping decimal can sit one ulp off
    // nearest. Pinned against 20k CPython ground-truth reprs.
    val exact = new java.math.BigDecimal(abs)
    var digits: String = null
    var exp10 = 0
    var p = 0
    while (digits == null && p < 17) {
      val c0 = exact.round(mcs(p + 1))
      var chosen: java.math.BigDecimal = null
      if (c0.doubleValue == abs) chosen = c0
      else {
        val ulp = c0.ulp
        val cUp = c0.add(ulp)
        if (cUp.doubleValue == abs) chosen = cUp
        else {
          val cDn = c0.subtract(ulp)
          if (cDn.signum > 0 && cDn.doubleValue == abs) chosen = cDn
        }
      }
      if (chosen != null) {
        val de = bdDigits(chosen)
        digits = de._1
        exp10 = de._2
      }
      p += 1
    }
    if (digits == null) {
      // unreachable: the correctly-rounded 17-digit decimal always
      // round-trips; kept as a safety net.
      val de = bdDigits(exact.round(mcs(17)))
      digits = de._1
      exp10 = de._2
    }
    val trimmed0 = digits.reverse.dropWhile(_ == '0').reverse
    val trimmed = if (trimmed0.isEmpty) "0" else trimmed0
    (trimmed, exp10)
  }

  /** Python `repr(float)` — shortest round-trip decimal, positional for
    * exponents in [-4, 16), else `1e+17`-style scientific. */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    val abs = math.abs(d)
    val sign = if (d < 0 || (d == 0.0 && 1.0 / d < 0)) "-" else ""
    if (abs == 0.0) return sign + "0.0"
    val (trimmed, exp10) = shortestDigitsOf(abs)
    // CPython: positional for exp10 in [-4, 16), exponent `e±DD` (2+ digits)
    renderDigits(sign, trimmed, exp10, -4, 16,
      e => if (e < 0) f"-${-e}%02d" else f"+$e%02d")
  }

  /** ECMAScript/yyjson-style shortest repr: positional for exponents in
    * [-6, 21), else scientific with unpadded exponent and no `+`
    * (`1.5e-7`, `1e21`). Same digits as pyFloatRepr — only the notation
    * cutoffs differ. Pinned against DuckDB `json_extract` re-serialization
    * (10k-double probe, zero mismatches) in KernelPropertySpec. */
  def esFloatRepr(d: Double): String = {
    if (d.isNaN || d.isInfinite) return "null" // unreachable after scrub
    val abs = math.abs(d)
    val sign = if (d < 0 || (d == 0.0 && 1.0 / d < 0)) "-" else ""
    if (abs == 0.0) return sign + "0.0"
    val (trimmed, exp10) = shortestDigitsOf(abs)
    renderDigits(sign, trimmed, exp10, -6, 21, _.toString)
  }

  /** Shared notation layer over shortestDigitsOf: positional (with `.0` for
    * integral values) while `lo <= exp10 < hi`, else `d.ddd e<suffix>` —
    * the ONLY differences between CPython and ES forms are the cutoffs and
    * the exponent suffix, so both renderers share this body and cannot
    * drift digit-wise. */
  private def renderDigits(sign: String, trimmed: String, exp10: Int,
      lo: Int, hi: Int, expSuffix: Int => String): String = {
    if (trimmed == "0") return sign + "0.0"
    // value = trimmed[0].trimmed[1:] * 10^exp10
    if (exp10 >= lo && exp10 < hi) {
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
      s"$sign${mant}e${expSuffix(exp10)}"
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
