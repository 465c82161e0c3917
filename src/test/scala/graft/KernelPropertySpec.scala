package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node._

import graft.functions.{Kernel, PyJson, PyLiteral}

/** Property tests for the kernel (SURVEY.md §5 port plan): flatten
  * structure, Python-literal round-trips, stringify/sanitize invariants. */
class KernelPropertySpec extends AnyFunSuite {

  /** Deterministic generator sampling (no scalatest-plus bridge offline). */
  private def forAll[T](g: Gen[T], n: Int = 200)(body: T => Unit): Unit = {
    val params = Gen.Parameters.default
    var produced = 0
    var i = 0L
    while (produced < n && i < n * 10L) {
      g.apply(params, Seed(i)).foreach { v => body(v); produced += 1 }
      i += 1
    }
    assert(produced > n / 2, s"generator too sparse: $produced of $n")
  }

  private val scalarGen: Gen[JsonNode] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L).map(new LongNode(_)),
    Gen.choose(-1e6, 1e6).map(new DoubleNode(_)),
    Gen.alphaNumStr.map(s => new TextNode("x" + s)), // non-decodable strings
    Gen.oneOf(BooleanNode.TRUE, BooleanNode.FALSE),
    Gen.const(NullNode.getInstance))

  private def objGen(depth: Int): Gen[ObjectNode] =
    Gen.mapOf(Gen.zip(Gen.identifier.map("k" + _), nodeGen(depth)))
      .map { m =>
        val o = PyJson.mapper.createObjectNode()
        m.foreach { case (k, v) => o.set[JsonNode](k, v) }
        o
      }

  private def nodeGen(depth: Int): Gen[JsonNode] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      2 -> Gen.listOfN(2, nodeGen(depth - 1)).map { xs =>
        val a = PyJson.mapper.createArrayNode(); xs.foreach(a.add); a
      },
      2 -> objGen(depth - 1))

  test("flatten of a flat scalar object is the identity on keys/values") {
    forAll(Gen.mapOf(Gen.zip(Gen.identifier.map("k" + _), scalarGen))) { m =>
      val o = PyJson.mapper.createObjectNode()
      m.foreach { case (k, v) => o.set[JsonNode](k, v) }
      val flat = Kernel.flatten(o)
      assert(flat.keySet == m.keySet)
      m.foreach { case (k, v) => assert(flat(k) == v) }
    }
  }

  test("flatten is idempotent on already-flat maps") {
    forAll(Gen.mapOf(Gen.zip(Gen.identifier.map("k" + _), scalarGen))) { m =>
      val o = PyJson.mapper.createObjectNode()
      m.foreach { case (k, v) => o.set[JsonNode](k, v) }
      val once = Kernel.flatten(o)
      val o2 = PyJson.mapper.createObjectNode()
      once.foreach { case (k, v) => o2.set[JsonNode](k, v) }
      assert(Kernel.flatten(o2) == once)
    }
  }

  test("flatten emits every list whole AND indexed") {
    forAll(nodeGen(3)) { n =>
      val flat = Kernel.flatten(n, parentKey = "root")
      flat.foreach { case (k, v) =>
        if (v.isArray) {
          val a = v.asInstanceOf[ArrayNode]
          (0 until a.size).foreach { i =>
            // each SCALAR element is present at exactly k_i; container
            // elements flatten further and empty objects emit nothing
            // (reference semantics: flatten({}) == {}).
            val el = a.get(i)
            if (!el.isContainerNode && !(el.isTextual && PyJson.expandEmbedded(el.asText).nonEmpty))
              assert(flat.contains(s"${k}_$i"), s"missing indexed entry for $k[$i]")
          }
        }
      }
    }
  }

  test("pyRepr(parse) round-trips through PyLiteral for literal trees") {
    forAll(nodeGen(2)) { n =>
      val repr = PyJson.pyRepr(n)
      // A Python repr of a dict/list/scalar must be parseable back by the
      // literal parser, and re-repr to the same text (fixed point).
      val parsed = PyLiteral.parse(repr)
      assert(PyJson.pyRepr(parsed) == repr)
    }
  }

  test("makeValidString strips all control characters and is idempotent on its own output for control-free strings") {
    forAll(Gen.asciiPrintableStr.suchThat(!_.exists(c => c == '\\' || c == '"' || c == '\'' || c == '[' || c == ']'))) { s =>
      val out = Kernel.makeValidString(new TextNode(s))
      assert(!out.exists(c => c < ' '))
      assert(Kernel.makeValidString(new TextNode(out)) == out)
    }
  }

  test("locationQuality only returns QARTOD codes 1, 3, 4") {
    forAll(Gen.zip(Gen.choose(-400.0, 400.0), Gen.choose(-200.0, 200.0), Gen.oneOf(true, false))) {
      case (lon, lat, impr) =>
        assert(Set(1, 3, 4).contains(Kernel.locationQuality(lon, lat, impr)))
    }
  }

  test("expandEmbedded rejects trailing tokens like json.loads does") {
    // Python json.loads raises on all of these; the string must survive
    // unexpanded (a free-text value must not collapse to its prefix).
    Seq("123 Main St", "1 2", "true false", "{}x", "[1] tail", "null null")
      .foreach { s => assert(PyJson.expandEmbedded(s).isEmpty, s"'$s' must not decode") }
    // …while genuine single values (whitespace-padded) still decode.
    assert(PyJson.expandEmbedded(" 123 ").exists(_.asLong == 123L))
    assert(PyJson.expandEmbedded("{\"a\": 1}").exists(_.isObject))
    assert(PyJson.expandEmbedded("{'a': False}").exists(_.isObject))
  }

  test("pyFloatRepr is the SHORTEST round-trip decimal (CPython repr contract)") {
    val rnd = new scala.util.Random(123)
    def sigDigits(s: String): Int =
      s.takeWhile(c => c != 'e' && c != 'E').filter(_.isDigit)
        .dropWhile(_ == '0').reverse.dropWhile(_ == '0').length
    (0 until 20000).foreach { i =>
      val d = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 1e3
        case 1 => java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
          case x if x.isNaN || x.isInfinite => 1.5
          case x => x
        }
        case 2 => rnd.nextFloat().toDouble // float-precision values
        case 3 => math.pow(10, rnd.nextInt(40) - 20) * rnd.nextDouble()
      }
      val repr = graft.functions.PyJson.pyFloatRepr(d)
      assert(repr.toDouble == d, s"round-trip failed: $d -> $repr")
      // minimality: NO decimal with one fewer significant digit may
      // round-trip — checked via the correctly-rounded candidate and its
      // decimal neighbors (the only possible round-trippers at a length)
      val p = sigDigits(repr) - 1
      if (p >= 1) {
        val abs = math.abs(d)
        val c0 = new java.math.BigDecimal(abs).round(
          new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
        val cands = Seq(c0, c0.add(c0.ulp), c0.subtract(c0.ulp))
        assert(!cands.exists(c => c.signum > 0 && c.doubleValue == abs),
          s"$d: repr $repr not minimal (a $p-digit decimal also round-trips)")
      }
    }
  }

  test("esFloatRepr matches yyjson/ES dtoa exemplars and round-trips") {
    import graft.functions.PyJson
    // Exemplars verified against DuckDB's json_extract re-serialization
    // (yyjson dtoa) on 2026-08-12 — zero mismatches on a 10k-double probe.
    val cases = Seq(
      1.5e-8 -> "1.5e-8", 1.5e-7 -> "1.5e-7", 1.5e-6 -> "0.0000015",
      1e-5 -> "0.00001", 1e-4 -> "0.0001", 19.625 -> "19.625",
      1.5e16 -> "15000000000000000.0", 1e16 -> "10000000000000000.0",
      1.2345678901234568e17 -> "123456789012345680.0",
      1e21 -> "1e21", 1.5e22 -> "1.5e22", 1e308 -> "1e308",
      java.lang.Double.MIN_VALUE -> "5e-324",
      -4.76837158203125e-7 -> "-4.76837158203125e-7",
      0.0 -> "0.0", -0.0 -> "-0.0", 15.0 -> "15.0", -117.23809051513672 -> "-117.23809051513672")
    cases.foreach { case (d, want) =>
      assert(PyJson.esFloatRepr(d) == want, s"esFloatRepr($d)")
    }
    // Round-trip + digit-identity with pyFloatRepr across random bit patterns
    val rnd = new scala.util.Random(7)
    def mantissaDigits(s: String): String =
      s.takeWhile(c => c != 'e' && c != 'E').filter(_.isDigit)
        .dropWhile(_ == '0').reverse.dropWhile(_ == '0').reverse
    (0 until 20000).foreach { _ =>
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong()) match {
        case x if x.isNaN || x.isInfinite => 1.5
        case x => x
      }
      val es = PyJson.esFloatRepr(d)
      assert(es.toDouble == d, s"es round-trip failed: $d -> $es")
      assert(mantissaDigits(es) == mantissaDigits(PyJson.pyFloatRepr(d)),
        s"$d: es/py digit mismatch: $es vs ${PyJson.pyFloatRepr(d)}")
    }
  }

  test("canonical payload renders doubles CPython-style (json.dumps parity)") {
    import graft.functions.PyJson
    val c = PyJson.canonical(PyJson.parse("""{"a":1.5e-7,"b":[0.00015,1e16],"s":"x","i":7}"""))
    assert(c == """{"a":1.5e-07,"b":[0.00015,1e+16],"s":"x","i":7}""")
    val e = PyJson.canonicalEs(PyJson.parse("""{"a":1.5e-7,"b":[0.00015,1e16],"s":"x","i":7}"""))
    assert(e == """{"a":1.5e-7,"b":[0.00015,10000000000000000.0],"s":"x","i":7}""")
  }

  test("pyFloatRepr matches CPython repr on a 20k ground-truth corpus") {
    // src/test/resources/pyfloat_repr_golden.txt: "<ieee-bits-hex> <repr>"
    // generated with CPython 3.11 over uniform bit patterns, powers of two
    // (incl. subnormals), float32 values, and positional-range doubles.
    val in = getClass.getResourceAsStream("/pyfloat_repr_golden.txt")
    assert(in != null, "golden resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      var n = 0
      src.getLines().foreach { line =>
        val sp = line.indexOf(' ')
        val d = java.lang.Double.longBitsToDouble(
          java.lang.Long.parseUnsignedLong(line.substring(0, sp), 16))
        val want = line.substring(sp + 1)
        val got = graft.functions.PyJson.pyFloatRepr(d)
        assert(got == want, s"bits=${line.substring(0, sp)} d=$d: got $got want $want")
        n += 1
      }
      assert(n > 20000)
    } finally src.close()
  }

  test("pyFloatRepr matches CPython repr at power-of-two boundaries") {
    // Round-trip success is non-monotone in precision exactly here
    // (asymmetric rounding intervals) — these pin the ascending probe.
    // Ground truth: CPython 3.11 repr().
    val goldens = Seq(
      math.pow(2, 149)  -> "7.1362384635298e+44",
      math.pow(2, -499) -> "6.10987272699921e-151",
      math.pow(2, 739)  -> "2.891790293717215e+222",
      math.pow(2, 956)  -> "6.090821257125e+287",
      java.lang.Double.MIN_VALUE -> "5e-324",
      math.pow(2, 1023) -> "8.98846567431158e+307",
      math.pow(2, -20)  -> "9.5367431640625e-07",
      math.pow(2, 52)   -> "4503599627370496.0")
    goldens.foreach { case (d, want) =>
      assert(graft.functions.PyJson.pyFloatRepr(d) == want,
        s"$d: got ${graft.functions.PyJson.pyFloatRepr(d)}, want $want")
    }
  }

  test("rolling window hash equals direct recomputation of every window") {
    import graft.functions.RollingHashKernel
    import org.apache.spark.unsafe.types.UTF8String
    def brute(bytes: Array[Byte], k: Int): Long =
      if (bytes.length <= k) RollingHashKernel.directHash(bytes, 0, bytes.length)
      else (0 to bytes.length - k)
        .map(i => RollingHashKernel.directHash(bytes, i, i + k)).min
    forAll(Gen.asciiPrintableStr, n = 300) { s =>
      val bytes = s.getBytes("UTF-8")
      Seq(1, 4, 32).foreach { k =>
        assert(RollingHashKernel.minWindowHash(UTF8String.fromString(s), k) == brute(bytes, k),
          s"k=$k text=${s.take(40)}")
      }
    }
  }

  test("parseTimeUtc discards a non-UTC offset (reference replace(tzinfo=utc))") {
    // dtparse(x).replace(tzinfo=pytz.utc): wall-clock reinterpreted as UTC.
    val us = Kernel.parseTimeUtc("2019-01-01T12:00:00+05:00")
    assert(us == Kernel.parseTimeUtc("2019-01-01T12:00:00Z"))
    assert(us == Kernel.parseTimeUtc("2019-01-01T12:00:00"))
    // Z and explicit +00:00 agree, fractional seconds survive.
    assert(Kernel.parseTimeUtc("2019-01-01T12:00:00.250-08:00") ==
      Kernel.parseTimeUtc("2019-01-01T12:00:00.250Z"))
  }

  // --- statistical-identity guards for the oracled exact formulas ---
  // e22 computes Spearman as (n(n²−1) − 6Σd²)/n(n²−1) over BIGINT ranks,
  // e26 computes Pearson as (nΣxy−ΣxΣy)/(√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))
  // over BIGINT count sums. Pin each against its definitional form so a
  // future edit to the query's arithmetic cannot silently change the
  // statistic while staying self-consistent with its own oracle twin.

  test("e22 identity: integer-form Spearman equals Pearson of the ranks (tie-free)") {
    forAll(Gen.zip(Gen.choose(3, 60), Gen.choose(0L, 1000000L)).map { case (n, seed) =>
        new scala.util.Random(seed).shuffle((1 to n).toVector) }, 100) { perm =>
      val n = perm.length.toLong
      val rt = (1 to perm.length).map(_.toLong) // identity ranks
      val rv = perm.map(_.toLong)
      val s = rv.zip(rt).map { case (a, b) => (a - b) * (a - b) }.sum
      val rho = (n * (n * n - 1) - 6L * s).toDouble / (n * (n * n - 1)).toDouble
      // Definitional Pearson over the two rank vectors.
      val mx = rv.map(_.toDouble).sum / n
      val my = rt.map(_.toDouble).sum / n
      val cov = rv.zip(rt).map { case (a, b) => (a - mx) * (b - my) }.sum
      val sx = math.sqrt(rv.map(a => (a - mx) * (a - mx)).sum)
      val sy = math.sqrt(rt.map(b => (b - my) * (b - my)).sum)
      assert(math.abs(rho - cov / (sx * sy)) < 1e-9, s"n=$n perm=${perm.take(8)}")
    }
  }

  test("e26 identity: raw-moment Pearson equals the mean-centered definition") {
    val vecGen = for {
      n <- Gen.choose(3, 50)
      xs <- Gen.listOfN(n, Gen.choose(0L, 500L))
      ys <- Gen.listOfN(n, Gen.choose(0L, 500L))
    } yield (xs.toVector, ys.toVector)
    forAll(vecGen, 100) { case (xs, ys) =>
      val n = xs.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val denomX = n * sxx - sx * sx
      val denomY = n * syy - sy * sy
      if (denomX > 0 && denomY > 0) { // constant series have no correlation
        val raw = (n * sxy - sx * sy).toDouble /
          (math.sqrt(denomX.toDouble) * math.sqrt(denomY.toDouble))
        val mx = sx.toDouble / n
        val my = sy.toDouble / n
        val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
        val vx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum)
        val vy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
        assert(math.abs(raw - cov / (vx * vy)) < 1e-9, s"n=$n")
      }
    }
  }
}
