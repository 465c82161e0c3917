package graft.streaming

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Spark 4 arbitrary-state operators (`transformWithState`) — the successor
  * API to `flatMapGroupsWithState`, backed by the RocksDB state store.
  *
  * [[LastWinsProcessor]] is the pure-streaming mirror of the sink's upsert
  * semantics (K2/T17): per key, state holds the latest value in stream
  * order and each micro-batch emits the key's current value — so a
  * downstream consumer sees exactly the row the reference's
  * `ON CONFLICT DO UPDATE` would have left in the table, without a
  * database in the loop. State is O(keys), partitioned by key; at 100 TB
  * the RocksDB store spills per-partition state off-heap. */
class LastWinsProcessor[K, V](valueEnc: Encoder[V])
    extends StatefulProcessor[K, (K, V), (K, V)] {

  @transient private var state: ValueState[V] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[V]("last", valueEnc, TTLConfig.NONE)

  override def handleInputRows(key: K, rows: Iterator[(K, V)],
      timerValues: TimerValues): Iterator[(K, V)] = {
    // Iterator order within a key follows stream order in a micro-batch —
    // the same contract dedupLastWins re-establishes for the batch sink.
    var any = false
    rows.foreach { r => state.update(r._2); any = true }
    if (any || state.exists()) Iterator((key, state.get())) else Iterator.empty
  }
}
