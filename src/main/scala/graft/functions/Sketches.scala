package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable cardinality / frequency sketches — the sublinear scale paths
  * the exact operators point at (q2_scale's scaladoc: "q6's sketch is the
  * sublinear answer"; d16's DF-cap: "re-measure per corpus").
  *
  * Both aggregates follow the mergeable-summaries discipline (Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi — PODS'12): the buffer is a bounded
  * summary, `reduce` is amortized O(1) per row, `merge` is
  * order-insensitive, and the shuffle carries ONLY summaries (≤ k values
  * per partial aggregate), never rows — at 100 TB an exact
  * `count(distinct)` shuffles every distinct pair (q2's 3×-Expand wall),
  * while a sketch pipeline's exchange is O(partitions · k) regardless of
  * corpus size.
  *
  * Exactness contract (what makes these ORACLE-able): below capacity the
  * summaries are lossless — KMV keeps every distinct hash until it holds
  * k of them, and the Misra–Gries map never evicts until it holds more
  * than its capacity — so in the sub-capacity regime estimates equal the
  * exact answers bit-for-bit and the DuckDB hash gate runs the plain
  * `count(distinct)` / `count(*) top-k` SQL. Above capacity the error is
  * spec-bound (SketchSpec), not oracle-bound, the same split q45/s2 use.
  *
  * SURVEY.md §2.4 references: the reference engine has no sketch surface
  * (row-at-a-time, `README.md:13-15`); these extend the capability layer
  * the same way q45 (approx percentiles) does.
  */
object Sketches {

  /** 2^64 as a double — the sketch-space hash domain width. */
  private[functions] val Two64 = 1.8446744073709552e19
  /** 2^63 as a double — offset from sketch-space (signed) to unsigned. */
  private[functions] val Two63 = 9.223372036854775808e18

  // ---------------------------------------------------------------------
  // KMV (bottom-k / theta) distinct sketch
  // ---------------------------------------------------------------------

  /** Buffer: the k smallest DISTINCT values seen, in "sketch space"
    * (input hash XOR Long.MinValue, so SIGNED order equals unsigned hash
    * order and Spark's `array_sort`/`array_intersect` compose downstream).
    * Appends are O(1); sort+dedup+trim runs only when the scratch array
    * fills, so a partition scan costs O(n log k) total. Once saturated,
    * values at or above the current k-th smallest are rejected on arrival
    * — acceptance probability decays to k/n, so late-scan appends are
    * rare. */
  final class KmvBuf(val k: Int) extends Serializable {
    /** Scratch-array hard cap: at this size a compact() always frees at
      * least half the slots (n ≤ k after trim), so growth can stop. */
    private def cap: Int = math.max(16, 2 * k)
    // The scratch array grows GEOMETRICALLY toward `cap` instead of
    // eagerly allocating 2k slots: a buffer only ever holds (and — the
    // part that bit at sf1 — kryo-SERIALIZES) memory proportional to the
    // distinct data it actually saw. With the raised ci.sh capacities
    // (k = 2M ⇒ 32 MB at cap) the eager layout shipped a 32 MB array for
    // EVERY partial of every column — a 9-distinct-value column's
    // partials cost the same as a 1.5M-distinct one's, and q63/q64's
    // 10-column profile × 16 partitions OOM'd a 32 GB heap on empty
    // space. Right-sized buffers make partial size track content.
    var arr: Array[Long] = new Array[Long](math.min(1024, cap))
    var n: Int = 0
    /** Saturation threshold in sketch space; MaxValue until k kept. */
    var thr: Long = Long.MaxValue

    def add(u: Long): Unit =
      if (u < thr || (u == thr && thr == Long.MaxValue)) {
        if (n == arr.length) {
          if (arr.length == cap) {
            // At cap, compact() always frees space: it trims to n ≤ k and
            // can only fail if k distinct values all beat thr —
            // impossible, it resets thr to the new k-th smallest.
            compact()
          } else {
            // Below cap: dedup first (mostly-duplicate streams never
            // grow), then grow only if the survivors keep the array
            // more than half full (amortized O(n log k) total).
            compact()
            if (n > arr.length / 2)
              arr = java.util.Arrays.copyOf(arr,
                math.min(cap.toLong, arr.length * 2L).toInt)
          }
        }
        arr(n) = u
        n += 1
      }

    def compact(): Unit = {
      java.util.Arrays.sort(arr, 0, n)
      var w = 0
      var i = 0
      while (i < n) {
        if (w == 0 || arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
        i += 1
      }
      n = math.min(w, k)
      if (n == k) thr = arr(k - 1)
    }
  }

  /** `kmv_sketch(hash)` — bottom-k sketch of a 64-bit hash column (feed it
    * `xxhash64(key)` so the hot hashing stays whole-stage-codegen'd; the
    * aggregate only maintains the bounded buffer). Output: the sketch as a
    * sorted ascending array (sketch space), `size < k` ⇔ lossless. */
  final case class KmvSketch(k: Int) extends Aggregator[Long, KmvBuf, Array[Long]] {
    require(k >= 2, s"kmv sketch needs k >= 2, got $k")
    def zero: KmvBuf = new KmvBuf(k)
    def reduce(b: KmvBuf, h: Long): KmvBuf = { b.add(h ^ Long.MinValue); b }
    def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      var i = 0
      while (i < b.n) { a.add(b.arr(i)); i += 1 }
      a
    }
    def finish(b: KmvBuf): Array[Long] = {
      b.compact()
      java.util.Arrays.copyOfRange(b.arr, 0, b.n)
    }
    def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** [[KmvSketch]] with a BOXED input that SKIPS nulls — the PctSketch
    * null-handling pattern applied to distinct counting. Needed wherever
    * per-column null exclusion must happen INSIDE one shared aggregate
    * pass (q63's one-scan profiler): a query-level `isNotNull` filter
    * would drop the whole ROW from every column's sketch when only one
    * column is null, and the oracle's `count(distinct col)` excludes
    * nulls per column, not per row. Feed it
    * `when(col.isNotNull, xxhash64(col))` so hashing stays codegen'd and
    * the null indicator rides the boxed input. */
  final case class KmvSketchOpt(k: Int)
      extends Aggregator[java.lang.Long, KmvBuf, Array[Long]] {
    private val inner = KmvSketch(k)
    def zero: KmvBuf = inner.zero
    def reduce(b: KmvBuf, h: java.lang.Long): KmvBuf =
      if (h == null) b else inner.reduce(b, h.longValue)
    def merge(a: KmvBuf, b: KmvBuf): KmvBuf = inner.merge(a, b)
    def finish(b: KmvBuf): Array[Long] = inner.finish(b)
    def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Distinct-count estimate from a sketch column: exact `size` below k;
    * at saturation the classic unbiased (k−1)/θ_k with θ_k the k-th
    * smallest hash as a fraction of the hash domain (Beyer et al.,
    * SIGMOD'07). σ ≈ ndv/√(k−2). */
  def kmvNdv(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((element_at(sketch, k).cast("double") + Two63 + 1.0) / Two64))

  /** Scalar twin of [[kmvNdv]] over a finished sketch array (the streaming
    * processor evaluates it per key per micro-batch) — SAME arithmetic so
    * batch and stream estimates agree bit-for-bit on the same sketch. */
  def ndvFromSketch(arr: Array[Long], k: Int): Double =
    if (arr.length < k) arr.length.toDouble
    else (k - 1).toDouble / ((arr(k - 1).toDouble + Two63 + 1.0) / Two64)

  /** Union sketch: bottom-k of the merged distinct hash sets — the same
    * summary `kmv_sketch` would have built over the concatenated inputs,
    * composed post-aggregation with array ops (no re-scan). */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Intersection-cardinality estimate for two sketches: ρ·|A∪B| where ρ
    * is the fraction of the union's bottom-k present in BOTH sketches
    * (Beyer et al.'s K-min-wise estimator). Below saturation both
    * sketches are complete sets, so the branch returns the EXACT
    * |A∩B| (bit-stable — no ρ·ndv float round-trip). */
  def kmvIntersectNdv(a: Column, b: Column, k: Int): Column = {
    val u = kmvUnion(a, b, k)
    val common = size(array_intersect(array_intersect(u, a), b))
    when(size(u) === 0, lit(0.0))
      .when(size(u) < k, common.cast("double"))
      .otherwise(common.cast("double") / lit(k.toDouble) * kmvNdv(u, k))
  }

  /** Union-cardinality estimate (exact below saturation). */
  def kmvUnionNdv(a: Column, b: Column, k: Int): Column =
    kmvNdv(kmvUnion(a, b, k), k)

  /** All four pair statistics — ndv(a), ndv(b), union ndv, intersection
    * ndv — in ONE two-pointer merge pass over the primitive long arrays
    * (r16, optimization guide "per-task work"): the column-expression
    * composition above re-evaluates `kmvUnion` (an O(k log k)
    * array_union + array_sort + slice over boxed elements) up to four
    * times per pair row, and a global orderBy's range-partitioning
    * SAMPLING pass evaluates the whole project a second time — measured
    * 2.9 s of the 190-pair d16_scale at sf0.1 in exactly these two
    * single-task jobs. Inputs MUST be finished [[KmvSketch]] arrays
    * (sorted ascending, unique — compact() guarantees both); arithmetic
    * is [[ndvFromSketch]] verbatim on the same merged prefix the
    * expression chain builds, so every output double is bit-identical
    * (SketchSpec pins fused == composed on UDAF-built sketches). */
  def kmvPairStats(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(
      KmvPairStatsExpr(ColumnShim.expression(a), ColumnShim.expression(b), k))
  }

  // ---------------------------------------------------------------------
  // Misra–Gries / Space-Saving heavy hitters
  // ---------------------------------------------------------------------

  /** One reported heavy hitter: estimated count underestimates the true
    * count by at most `err` (the buffer's accumulated deduction). */
  final case class HeavyHitter(key: Long, cnt: Long, err: Long)

  /** Buffer: key → count map, at most 2·cap entries between trims.
    * `deducted` is the total mass subtracted by trims — every surviving
    * count underestimates its true count by AT MOST `deducted`, and any
    * key with true count > deducted is guaranteed present (the
    * Misra–Gries invariant: each unit of deduction is paid by ≥ cap
    * distinct keys, so deducted ≤ n/cap). Key type is generic (Long ids,
    * String n-grams — anything hashable); kryo serializes the map. */
  final class TopKBuf[K](val cap: Int) extends Serializable {
    val m = new java.util.HashMap[K, Array[Long]](4 * cap)
    var deducted: Long = 0L

    def add(key: K, by: Long): Unit = {
      val e = m.get(key)
      if (e != null) e(0) += by
      else {
        m.put(key, Array(by))
        if (m.size > 2 * cap) trim()
      }
    }

    /** Subtract the (cap+1)-th largest count from every entry and drop the
      * non-positive — at least half the entries go, amortizing the O(m)
      * scan to O(1) per insert; `deducted` grows by the subtracted value. */
    def trim(): Unit = if (m.size > cap) {
      val counts = new Array[Long](m.size)
      var i = 0
      val it = m.values().iterator()
      while (it.hasNext) { counts(i) = it.next()(0); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - cap - 1) // (cap+1)-th largest
      deducted += cut
      val eit = m.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        e.getValue()(0) -= cut
        if (e.getValue()(0) <= 0) eit.remove()
      }
    }
  }

  /** Long-keyed Misra–Gries buffer on a PRIMITIVE open-addressing table
    * (linear probing, fmix64 scramble, empty slot ⇔ cnt == 0): the reduce
    * loop runs once per input ROW, and `java.util.HashMap[Long,_]` boxes
    * every probe — measured 73 ns/row at sf100 (600M rows). Semantics are
    * identical to [[TopKBuf]]: at most 2·cap live entries between trims,
    * a trim subtracts the (cap+1)-th largest count and rebuilds the table
    * (open addressing cannot delete in place without breaking probe
    * chains), `deducted` carries the error bound. Table capacity is the
    * power of two ≥ 4·cap+4, fixed for the buffer's lifetime: load factor
    * stays ≤ ~0.5, and counts of 1..2·cap entries always fit. */
  final class LongTopKBuf private () extends Serializable
      with com.esotericsoftware.kryo.KryoSerializable {
    def this(cap0: Int) = { this(); init(cap0) }
    var cap: Int = 0
    private var tableSize: Int = 0
    private var mask: Int = 0
    var keys: Array[Long] = null
    var cnts: Array[Long] = null
    var n: Int = 0
    var deducted: Long = 0L

    private def init(cap0: Int): Unit = {
      cap = cap0
      var c = 4
      while (c < 4 * cap0 + 4) c <<= 1
      tableSize = c
      mask = c - 1
      keys = new Array[Long](c)
      cnts = new Array[Long](c)
      n = 0
      deducted = 0L
    }

    // Kryo path (the udaf encoder's serializer): the probe table is ≥ half
    // EMPTY slots by construction, so field-serializing the raw arrays
    // ships 8–16× cap longs — at the ci.sh sf1 conf's skewCap = 2,097,152
    // that is a ~270 MB buffer, past any sane kryoserializer.buffer.max
    // (measured: q68_scale KRYO_BUFFER_OVERFLOW at the sf1 oracle gate).
    // Serialize ONLY the ≤ 2·cap occupied (key, cnt) pairs and rebuild the
    // probe layout on read — 4–8× smaller partials on the exchange at ANY
    // cap, identical logical content (probe order is not part of state).
    override def write(kryo: com.esotericsoftware.kryo.Kryo,
        out: com.esotericsoftware.kryo.io.Output): Unit = {
      out.writeInt(cap); out.writeLong(deducted); out.writeInt(n)
      foreachEntry { (k, c) => out.writeLong(k); out.writeLong(c) }
    }
    override def read(kryo: com.esotericsoftware.kryo.Kryo,
        in: com.esotericsoftware.kryo.io.Input): Unit = {
      val cap0 = in.readInt(); val ded = in.readLong(); val m = in.readInt()
      init(cap0)
      var i = 0
      while (i < m) { add(in.readLong(), in.readLong()); i += 1 }
      deducted = ded
    }

    private def slot(key: Long): Int = {
      // murmur3 fmix64 — full-avalanche scramble before masking
      var h = key
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      (h & mask).toInt
    }

    def add(key: Long, by: Long): Unit = {
      var i = slot(key)
      while (true) {
        if (cnts(i) == 0L) {
          keys(i) = key; cnts(i) = by; n += 1
          if (n > 2 * cap) trim()
          return
        } else if (keys(i) == key) {
          cnts(i) += by
          return
        } else i = (i + 1) & mask
      }
    }

    /** Subtract the (cap+1)-th largest count, drop the non-positive, and
      * rebuild the probe table; no-op below cap occupancy. */
    def trim(): Unit = if (n > cap) {
      val live = new Array[Long](n)
      var w = 0
      var i = 0
      while (i < tableSize) { if (cnts(i) != 0L) { live(w) = cnts(i); w += 1 }; i += 1 }
      java.util.Arrays.sort(live)
      val cut = live(w - cap - 1) // (cap+1)-th largest
      deducted += cut
      val oldKeys = keys; val oldCnts = cnts
      keys = new Array[Long](tableSize); cnts = new Array[Long](tableSize)
      n = 0
      i = 0
      while (i < tableSize) {
        if (oldCnts(i) > cut) add(oldKeys(i), oldCnts(i) - cut)
        i += 1
      }
    }

    def foreachEntry(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < tableSize) { if (cnts(i) != 0L) f(keys(i), cnts(i)); i += 1 }
    }
  }

  /** `topk_freq(key)` — mergeable per-group frequency summary with the
    * Misra–Gries guarantee: any key with true frequency > n/cap survives,
    * reported counts sit in [true − err, true]. Below cap distinct keys
    * per group the summary is EXACT (err = 0). Output: entries sorted by
    * (count desc, key asc) — a deterministic total order shared with the
    * oracle's `ORDER BY cnt DESC, key`.
    *
    * Determinism contract (vs [[KmvSketch]]): a KMV sketch is a set union —
    * bit-identical under ANY partitioning or merge tree at any size. An MG
    * summary above cap is NOT: trims fire at merge-tree-dependent points,
    * so the surviving counts (though never the guarantee) can differ with
    * partition layout. The spec therefore pins layout-invariance in the
    * exact regime only, and the oracle runs only there; above cap, consume
    * the [cnt, cnt+err] interval, not the point value. */
  final case class SpaceSavingTopK(cap: Int) extends Aggregator[Long, LongTopKBuf, Array[HeavyHitter]] {
    require(cap >= 1, s"topk_freq needs cap >= 1, got $cap")
    def zero: LongTopKBuf = new LongTopKBuf(cap)
    def reduce(b: LongTopKBuf, key: Long): LongTopKBuf = { b.add(key, 1L); b }
    def merge(a: LongTopKBuf, b: LongTopKBuf): LongTopKBuf = {
      b.foreachEntry((k, c) => a.add(k, c))
      a.deducted += b.deducted
      // Only trim when the merged occupancy exceeds what the buffer
      // tolerates anyway (2·cap, the reduce-phase invariant): trimming to
      // cap on EVERY merge deducts unnecessarily — each avoidable cut
      // inflates err and can empty a flat-distribution summary. finish()
      // still trims to cap, so the exact regime (distinct ≤ cap) and the
      // output bound are unchanged; the mass argument (each cut is paid
      // by > cap entries) keeps total deduction ≤ n/(cap+1) either way.
      if (a.n > 2 * a.cap) a.trim()
      a
    }
    def finish(b: LongTopKBuf): Array[HeavyHitter] = {
      b.trim()
      val out = new Array[HeavyHitter](b.n)
      var i = 0
      b.foreachEntry { (k, c) => out(i) = HeavyHitter(k, c, b.deducted); i += 1 }
      scala.util.Sorting.stableSort(out,
        (x: HeavyHitter, y: HeavyHitter) => x.cnt > y.cnt || (x.cnt == y.cnt && x.key < y.key))
      out
    }
    def bufferEncoder: Encoder[LongTopKBuf] = Encoders.kryo[LongTopKBuf]
    def outputEncoder: Encoder[Array[HeavyHitter]] = ExpressionEncoder[Array[HeavyHitter]]()
  }

  // ---------------------------------------------------------------------
  // MRL/KLL-style mergeable quantile sketch
  // ---------------------------------------------------------------------

  /** Finished quantile summary: values sorted ascending with aligned
    * power-of-two weights. `sum(ws)` equals the aggregated row count
    * EXACTLY (compactions and the odd-leftover rule preserve total
    * weight), so rank positions computed from the summary line up with
    * the true n — the property that makes the sub-capacity branch
    * bit-identical to the exact percentile. */
  final case class PctSummary(vs: Array[Double], ws: Array[Long])

  /** Buffer: a compactor hierarchy (Manku–Rajagopalan–Lindsay '98 /
    * KLL'16 with equal level capacities). Level i holds values of weight
    * 2^i; when a level exceeds `cap` it is sorted and PAIR-compacted —
    * every other element survives one level up at doubled weight, the
    * alternation offset flipping per compaction so adjacent-pair rank
    * errors cancel instead of accumulating. An odd element stays behind
    * at its own level and weight, so no compaction ever changes total
    * weight. Below `cap` total inputs nothing ever compacts: level 0 is
    * simply every value seen (the LOSSLESS regime — the oracle trick the
    * KMV/MG aggregates above use). Arrays grow geometrically from 16, so
    * sub-capacity memory is proportional to rows actually held, not to
    * `cap` — the sf1 gate can raise `spark.graft.sketch.pctCap` to the
    * per-group row count without pre-allocating it per buffer. */
  final class PctBuf(val cap: Int) extends Serializable {
    var vals: Array[Array[Double]] = Array(new Array[Double](16))
    var lens: Array[Int] = Array(0)
    var flips: Array[Boolean] = Array(false)
    var n: Long = 0L

    private def ensureLevel(i: Int): Unit = if (i >= vals.length) {
      vals = java.util.Arrays.copyOf(vals, i + 1)
      lens = java.util.Arrays.copyOf(lens, i + 1)
      flips = java.util.Arrays.copyOf(flips, i + 1)
      var j = 0
      while (j < vals.length) { if (vals(j) == null) vals(j) = new Array[Double](16); j += 1 }
    }

    /** Append without compaction (callers own the cascade check). */
    private def push(i: Int, v: Double): Unit = {
      if (lens(i) == vals(i).length)
        vals(i) = java.util.Arrays.copyOf(vals(i), 2 * vals(i).length)
      vals(i)(lens(i)) = v
      lens(i) += 1
    }

    def add(v: Double): Unit = {
      push(0, v)
      n += 1
      if (lens(0) > cap) compactLevel(0)
    }

    /** Sort level i and pair-compact it into level i+1. Survivor index
      * alternates within each pair via the per-level flip; the odd
      * leftover (post-sort minimum) keeps its weight in place. Cascades
      * upward when the receiving level overflows in turn. */
    def compactLevel(i: Int): Unit = {
      val a = vals(i)
      val m = lens(i)
      java.util.Arrays.sort(a, 0, m)
      val r = m & 1
      val off = if (flips(i)) 1 else 0
      flips(i) = !flips(i)
      ensureLevel(i + 1)
      var j = r + off
      while (j < m) { push(i + 1, a(j)); j += 2 }
      lens(i) = r
      if (lens(i + 1) > cap) compactLevel(i + 1)
    }

    /** Insert an already-weighted element at its level (weight must be a
      * power of two — summaries only ever hold those). Restores a buffer
      * from a finished summary: each element re-enters exactly the level
      * it left, so restore→summary round-trips are lossless — the
      * streaming processor's state contract. */
    def addWeighted(v: Double, w: Long): Unit = {
      require(java.lang.Long.bitCount(w) == 1, s"weight must be a power of two, got $w")
      val lvl = java.lang.Long.numberOfTrailingZeros(w)
      ensureLevel(lvl)
      push(lvl, v)
      n += w
      if (lens(lvl) > cap) compactLevel(lvl)
    }

    /** Level-wise append of another buffer, then one bottom-up cascade —
      * order-insensitive up to the documented merge-tree caveat. */
    def mergeFrom(b: PctBuf): Unit = {
      n += b.n
      var i = 0
      while (i < b.lens.length) {
        if (b.lens(i) > 0) {
          ensureLevel(i)
          var j = 0
          while (j < b.lens(i)) { push(i, b.vals(i)(j)); j += 1 }
        }
        i += 1
      }
      var l = 0
      while (l < lens.length) { // compactLevel may append a new top level
        if (lens(l) > cap) compactLevel(l)
        l += 1
      }
    }

    /** Gather every (value, 2^level) pair, sorted ascending by value.
      * Primitive throughout (no boxed index sort): each level gets one
      * `Arrays.sort` and the sorted runs merge by cursor scan. The hot
      * case is the LOSSLESS gate regime — one level, millions of raw
      * values per group at the sf1 capacities — which reduces to a single
      * primitive sort and a copy; the multi-level (saturated) case holds
      * ≤ cap·levels values, small by construction. */
    def summary(): (Array[Double], Array[Long]) = {
      var total = 0
      var live = 0
      var i = 0
      while (i < lens.length) {
        if (lens(i) > 0) { total += lens(i); live += 1 }
        i += 1
      }
      val vs = new Array[Double](total)
      val ws = new Array[Long](total)
      i = 0
      while (i < lens.length) {
        if (lens(i) > 0) java.util.Arrays.sort(vals(i), 0, lens(i))
        i += 1
      }
      if (live == 1) {
        i = 0
        while (lens(i) == 0) i += 1
        System.arraycopy(vals(i), 0, vs, 0, lens(i))
        java.util.Arrays.fill(ws, 1L << i)
      } else if (live > 1) {
        val cursor = new Array[Int](lens.length)
        var w = 0
        while (w < total) {
          var best = -1
          var l = 0
          while (l < lens.length) {
            if (cursor(l) < lens(l) &&
                (best == -1 || vals(l)(cursor(l)) < vals(best)(cursor(best)))) best = l
            l += 1
          }
          vs(w) = vals(best)(cursor(best))
          ws(w) = 1L << best
          cursor(best) += 1
          w += 1
        }
      }
      (vs, ws)
    }
  }

  /** `pct_sketch(value)` — mergeable rank/quantile summary. Holds at most
    * ~`cap`·log₂(n/cap) values; the shuffle carries summaries, never rows
    * — the bounded-memory percentile path for CONTINUOUS value domains,
    * where q7_scale's exact counts-table trick (which needs a bounded
    * integral domain) does not apply, and where the builtin `percentile`'s
    * value→count map is the suite's one OOM anchor.
    *
    * Exactness contract: below `cap` total rows per group nothing
    * compacts, the summary is every input value at weight 1, and
    * [[pctFromSketch]] reproduces `Percentile.getPercentile`'s doubles
    * bit-for-bit — the oracle regime. Above it, rank error is bounded by
    * the compaction count (ε ≈ 1.5·log₂(n/cap)/cap of n, spec-pinned
    * empirically in SketchSpec at 100× saturation).
    *
    * Determinism contract: same as [[SpaceSavingTopK]] — compactions fire
    * at merge-tree-dependent points, so above cap the summary (never the
    * bound) can differ with partition layout; below cap the summary is the
    * full multiset and any layout yields the same sorted output.
    *
    * Null semantics match the builtin `percentile`: the input is a BOXED
    * Double and `reduce` skips nulls, so a null value stays out of the
    * ranks while its GROUP still emits a row — an all-null group finishes
    * to an empty summary and [[pctFromSketch]] returns null, exactly the
    * builtin's row for such a group (the r8 bug class q7_scale documents:
    * a query-layer joint filter would instead drop rows from the OTHER
    * column's sketch and lose all-null groups entirely). The one box per
    * row is the price of one-scan null fidelity. */
  final case class PctSketch(cap: Int) extends Aggregator[java.lang.Double, PctBuf, PctSummary] {
    require(cap >= 8, s"pct_sketch needs cap >= 8, got $cap")
    def zero: PctBuf = new PctBuf(cap)
    def reduce(b: PctBuf, v: java.lang.Double): PctBuf = {
      if (v != null) b.add(v.doubleValue)
      b
    }
    def merge(a: PctBuf, b: PctBuf): PctBuf = { a.mergeFrom(b); a }
    def finish(b: PctBuf): PctSummary = {
      val (vs, ws) = b.summary()
      PctSummary(vs, ws)
    }
    def bufferEncoder: Encoder[PctBuf] = Encoders.kryo[PctBuf]
    def outputEncoder: Encoder[PctSummary] = ExpressionEncoder[PctSummary]()
  }

  /** WEIGHTED variant: each row carries an integer weight ≥ 0 (token
    * counts, importance tallies), and the quantile is taken over the
    * value repeated weight times — without materializing the repeats.
    * The weight decomposes into its binary powers, each piece entering
    * the compactor at its own level, so per-level uniformity (the
    * invariant every compaction relies on) is preserved and total weight
    * stays exact. Lossless regime: below `cap` ROWS per group no level
    * can overflow (each level holds at most one piece per row), so the
    * summary is the exact weighted multiset and [[pctFromSketch]] equals
    * the replicated-percentile doubles bit-for-bit — q61's oracle states
    * the same arithmetic in SQL over a cumulative-weight window. */
  final case class PctSketchWeighted(cap: Int) extends Aggregator[(Double, Long), PctBuf, PctSummary] {
    require(cap >= 8, s"pct_sketch_w needs cap >= 8, got $cap")
    def zero: PctBuf = new PctBuf(cap)
    def reduce(b: PctBuf, vw: (Double, Long)): PctBuf = {
      val (v, w0) = vw
      require(w0 >= 0L, s"pct_sketch_w weight must be >= 0, got $w0")
      var w = w0
      while (w != 0L) {
        val bit = java.lang.Long.lowestOneBit(w)
        b.addWeighted(v, bit)
        w ^= bit
      }
      b
    }
    def merge(a: PctBuf, b: PctBuf): PctBuf = { a.mergeFrom(b); a }
    def finish(b: PctBuf): PctSummary = {
      val (vs, ws) = b.summary()
      PctSummary(vs, ws)
    }
    def bufferEncoder: Encoder[PctBuf] = Encoders.kryo[PctBuf]
    def outputEncoder: Encoder[PctSummary] = ExpressionEncoder[PctSummary]()
  }

  /** Interpolated quantile from a finished summary — Spark
    * `Percentile.getPercentile`'s arithmetic generalized to weighted
    * points: element j covers sorted 0-based ranks [C_{j−1}, C_j−1]
    * (C = cumulative weight), pos = q·(W−1), and the result is
    * (ceil−pos)·v(floor) + (pos−floor)·v(ceil) in the same double
    * operation order. With unit weights (the lossless regime) C_j = j and
    * this IS the builtin's formula — the q7/q7_scale hash-match argument.
    * Shared by the batch UDF and the streaming processor so both agree
    * bit-for-bit on the same summary. */
  def pctFromSketch(vs: Array[Double], ws: Array[Long], q: Double): java.lang.Double = {
    if (vs.length == 0) return null
    var wTot = 0L
    var i = 0
    while (i < ws.length) { wTot += ws(i); i += 1 }
    val pos = q * (wTot - 1).toDouble
    val lower = math.floor(pos).toLong
    val higher = math.ceil(pos).toLong
    def at(r: Long): Double = {
      var cum = 0L
      var j = 0
      while (j < ws.length) {
        cum += ws(j)
        if (cum > r) return vs(j)
        j += 1
      }
      vs(vs.length - 1)
    }
    val lo = at(lower)
    if (higher == lower) lo
    else (higher - pos) * lo + (pos - lower) * at(higher)
  }

  /** The one shared UDF over [[pctFromSketch]] — used by both [[pctCol]]
    * and the SQL registration so the batch column and the SQL surface can
    * never drift apart. Null-safe: a null sketch (e.g. from an outer join
    * against a group with no summary) estimates null. A Scala UDF is
    * acceptable here by the q58 argument: it runs on |groups|-cardinality
    * summary rows post-aggregation, never on the corpus — the hot path
    * (per-row buffer maintenance) stays in the typed aggregate. */
  val pctFromSketchUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((vs: Seq[Double], ws: Seq[Long], qq: Double) =>
      if (vs == null || ws == null) null
      else pctFromSketch(vs.toArray, ws.toArray, qq))

  /** Column twin of [[pctFromSketch]] for batch queries. */
  def pctCol(sketch: Column, q: Double): Column =
    pctFromSketchUdf(sketch.getField("vs"), sketch.getField("ws"), lit(q))

  /** String-keyed heavy hitter (n-gram / term frequencies). */
  final case class HeavyHitterStr(key: String, cnt: Long, err: Long)

  /** [[SpaceSavingTopK]] over String keys — same buffer, guarantee, and
    * (cnt desc, key asc) output order; kept as a concrete class so both
    * variants get plain `ExpressionEncoder` outputs (no generic TypeTag
    * plumbing at the call sites). The key tie-break compares UTF-8 bytes,
    * not Java chars: Spark's orderBy and the DuckDB oracle both order
    * strings by UTF-8 binary, and UTF-16 code units disagree with that
    * for supplementary-plane characters, which would pick different keys
    * at a count-tied top-k slice boundary. */
  final case class SpaceSavingTopKStr(cap: Int) extends Aggregator[String, TopKBuf[String], Array[HeavyHitterStr]] {
    require(cap >= 1, s"topk_freq needs cap >= 1, got $cap")
    def zero: TopKBuf[String] = new TopKBuf[String](cap)
    def reduce(b: TopKBuf[String], key: String): TopKBuf[String] = { b.add(key, 1L); b }
    def merge(a: TopKBuf[String], b: TopKBuf[String]): TopKBuf[String] = {
      val it = b.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        a.add(e.getKey, e.getValue()(0))
      }
      a.deducted += b.deducted
      if (a.m.size > 2 * a.cap) a.trim() // Long variant's merge rule
      a
    }
    def finish(b: TopKBuf[String]): Array[HeavyHitterStr] = {
      b.trim()
      val out = new Array[HeavyHitterStr](b.m.size)
      var i = 0
      val it = b.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out(i) = HeavyHitterStr(e.getKey, e.getValue()(0), b.deducted)
        i += 1
      }
      scala.util.Sorting.stableSort(out,
        (x: HeavyHitterStr, y: HeavyHitterStr) =>
          x.cnt > y.cnt || (x.cnt == y.cnt &&
            java.util.Arrays.compareUnsigned(
              x.key.getBytes(java.nio.charset.StandardCharsets.UTF_8),
              y.key.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0))
      out
    }
    def bufferEncoder: Encoder[TopKBuf[String]] = Encoders.kryo[TopKBuf[String]]
    def outputEncoder: Encoder[Array[HeavyHitterStr]] = ExpressionEncoder[Array[HeavyHitterStr]]()
  }
}

/** Fused KMV pair statistics (see [[Sketches.kmvPairStats]]): one ordered
  * merge over two finished (sorted ascending, unique) sketch arrays
  * yields struct(n_a_est, n_b_est, union_ndv, inter_ndv) with arithmetic
  * bit-identical to the kmvNdv/kmvUnionNdv/kmvIntersectNdv column
  * composition. CodegenFallback on purpose: pair frames are
  * |groups|²-sized (hundreds of rows), the win is O(k) primitive access
  * vs repeated boxed array_union/array_sort/array_intersect, not codegen.
  */
case class KmvPairStatsExpr(left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.catalyst.util.ArrayData

  override def dataType: DataType = new StructType()
    .add("n_a_est", DoubleType).add("n_b_est", DoubleType)
    .add("union_ndv", DoubleType).add("inter_ndv", DoubleType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"kmv_pair_stats expects array<bigint> sketches, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData].toLongArray()
    val b = bv.asInstanceOf[ArrayData].toLongArray()
    // Ordered merge of two sorted-unique arrays: walk both, count merged
    // union elements (capped at k — the slice the expression chain takes)
    // and, among those, the ones present in BOTH inputs. Values are in
    // KMV sketch space (hash XOR Long.MinValue), where SIGNED order is
    // unsigned hash order and the chain's array_sort agrees — signed (<)
    // reproduces the exact same merged prefix.
    var i = 0; var j = 0; var m = 0; var common = 0
    var kth = 0L
    while (m < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) < b(j))
      val both = i < a.length && j < b.length && a(i) == b(j)
      if (both) { kth = a(i); i += 1; j += 1; common += 1 }
      else if (takeA) { kth = a(i); i += 1 }
      else { kth = b(j); j += 1 }
      m += 1
    }
    val unionNdv =
      if (m < k) m.toDouble
      else (k - 1).toDouble / ((kth.toDouble + Sketches.Two63 + 1.0) / Sketches.Two64)
    val interNdv =
      if (m == 0) 0.0
      else if (m < k) common.toDouble
      else common.toDouble / k.toDouble * unionNdv
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      Sketches.ndvFromSketch(a, k), Sketches.ndvFromSketch(b, k),
      unionNdv, interNdv))
  }

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): KmvPairStatsExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "kmv_pair_stats"
}
