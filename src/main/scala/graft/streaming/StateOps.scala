package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

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

object StateOps {
  /** Tuple encoder helper for [[LastWinsProcessor]] state. */
  def lastWinsState[V](implicit v: org.apache.spark.sql.Encoder[V]): org.apache.spark.sql.Encoder[(Long, V)] =
    Encoders.tuple(Encoders.scalaLong, v)
}
