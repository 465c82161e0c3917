package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.TableMapping
import graft.sinks.{RowSink, UpsertSink}
import graft.sources.MessageDecoder

/** The end-to-end streaming dataflow (SURVEY.md §3.1): source → decode →
  * mapping transform → upsert sink, as Structured Streaming.
  *
  * The reference's consume loop commits offsets every 100 messages after the
  * side effects (`/root/reference/dbsink/listen.py:178-186`) — at-least-once
  * with idempotent upsert. Here checkpointing plays the offset-commit role
  * and `foreachBatch` + key-dedup upsert keeps the same effectively-once
  * result.
  */
object Pipeline {

  /** Standard Kafka reader options (S1), assembled as data so they are
    * testable without the connector jar. Mirrors the reference's consumer
    * construction (`/root/reference/dbsink/utils.py:17-31`): a random
    * `dbsink-{topic}-{20 hex}` consumer group when none is given, and the
    * librdkafka offset aliases (`largest`/`smallest`) translated to the
    * `latest`/`earliest` the Spark connector expects. */
  def kafkaOptions(brokers: String, topic: String,
      offset: String = "latest", consumerGroup: Option[String] = None): Map[String, String] = {
    val group = consumerGroup.getOrElse(
      s"dbsink-$topic-${java.util.UUID.randomUUID.toString.replace("-", "").take(20)}")
    val starting = offset match {
      case "largest" => "latest"
      case "smallest" => "earliest"
      case other => other
    }
    Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> starting,
      "kafka.group.id" -> group)
  }

  /** Kafka source (S1). Jar-gated: the spark-sql-kafka connector is not in
    * this offline image, so `load()` only resolves at deploy time — see
    * README "Deploying against Kafka" for the classpath. Option assembly is
    * [[kafkaOptions]] (spec'd offline); activation is covered by the
    * jar-gated end-to-end test in KafkaSpec. */
  def kafkaSource(spark: SparkSession, brokers: String, topic: String,
      offset: String = "latest", consumerGroup: Option[String] = None): DataFrame =
    spark.readStream.format("kafka")
      .options(kafkaOptions(brokers, topic, offset, consumerGroup))
      .load()

  /** Name of the dead-letter accumulator registered by [[decoded]]. */
  val DeadLetterAccumulator = "graft.dead_letters"

  /** Most recently registered dead-letter accumulator (driver-side handle
    * for monitoring/tests; each decoded() call registers a fresh one). */
  @volatile var deadLetterCounter: org.apache.spark.util.LongAccumulator = _

  /** Decode a raw (key binary, value binary, offset) stream into the engine
    * message contract (key string, value json-string, __offset). Messages
    * the decoder rejects are dropped and counted in the `graft.dead_letters`
    * accumulator, mirroring the reference's log-and-skip contract
    * (`listen.py:138-143`). */
  def decoded(raw: DataFrame, decoder: MessageDecoder,
      counter: Option[org.apache.spark.util.LongAccumulator] = None,
      totalCounter: Option[org.apache.spark.util.LongAccumulator] = None): DataFrame = {
    val deadLetters = counter.getOrElse(
      raw.sparkSession.sparkContext.longAccumulator(DeadLetterAccumulator))
    deadLetterCounter = deadLetters
    // asNondeterministic: (a) stops the optimizer pushing the isNotNull
    // filter into a second evaluation of the decode (each message would be
    // decoded twice on the hot path), (b) keeps the accumulator single-count.
    val dec = udf((b: Array[Byte]) => {
      totalCounter.foreach(_.add(1))
      if (b == null) { deadLetters.add(1); None }
      else decoder.decode(b) match {
        case None => deadLetters.add(1); None
        case some => some
      }
    }).asNondeterministic()
    val withOffset =
      if (raw.columns.contains("offset")) raw.withColumn("__offset", col("offset"))
      else raw.withColumn("__offset", monotonically_increasing_id())
    val withKey =
      if (withOffset.columns.contains("key")) withOffset
      else withOffset.withColumn("key", lit("fake"))
    withKey
      .withColumn("key", coalesce(col("key").cast("string"), lit("")))
      .withColumn("value", dec(col("value").cast("binary")))
      .filter(col("value").isNotNull)
      .select("key", "value", "__offset")
  }

  /** Per-batch dead-letter metrics — the reference's operational skip log
    * (`listen.py:138-143` logs every rejected message) lifted to the
    * streaming surface (r15 verdict item 6): every pipeline micro-batch
    * records one (decoder, n_ok, n_dead) row, and [[Reporter]] — a
    * standard StreamingQueryListener — emits them as log lines on each
    * progress event, the cadence operations tooling actually consumes.
    * Counts here are the ACCUMULATOR's per-batch deltas (operational
    * best-effort, like the reference's log — under task retries a delta
    * can over-count); the EXACT contract is q71's structural row. */
  object DeadLetterMetrics {
    final case class BatchMetric(tag: String, batchId: Long, decoder: String,
        nOk: Long, nDead: Long)
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetric]()
    private[streaming] def record(m: BatchMetric): Unit = buf.add(m)
    /** Snapshot (oldest-first) without consuming — tests and the q71
      * streaming twin read totals from here. */
    def snapshot(): Seq[BatchMetric] = {
      val it = buf.iterator(); val b = Seq.newBuilder[BatchMetric]
      while (it.hasNext) b += it.next()
      b.result()
    }
    def reset(): Unit = buf.clear()

    /** Drains pending batch rows to the graft log on every progress event —
      * register with `spark.streams.addListener(Pipeline.DeadLetterMetrics
      * .Reporter)` (run() does this once per session). */
    object Reporter
        extends org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      private val reported = new java.util.concurrent.atomic.AtomicInteger(0)
      def onQueryStarted(e: QueryStartedEvent): Unit = ()
      def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      def onQueryProgress(e: QueryProgressEvent): Unit = {
        val all = snapshot()
        val fresh = all.drop(reported.getAndSet(all.size))
        fresh.foreach(m => graft.core.Log.info(
          s"dead_letters pipeline=${m.tag} batch=${m.batchId} " +
            s"decoder=${m.decoder} n_ok=${m.nOk} n_dead=${m.nDead}"))
      }
    }
  }

  private val listenerRegistered =
    java.util.Collections.synchronizedSet(new java.util.HashSet[SparkSession]())

  /** readStream → foreachBatch(decode → transform → upsert), checkpointed.
    * Decode/transform run inside the batch context so the fallback offset
    * (`monotonically_increasing_id`, disallowed in streaming plans) is legal;
    * with a Kafka source the real `offset` column is used instead.
    *
    * The default trigger drains available offsets and stops (replay/test
    * shape); a live listener must pass a continuous trigger — the CLI uses
    * `Trigger.ProcessingTime(0)` to mirror the reference's endless consume
    * loop (`listen.py:178-186`). */
  def run(stream: DataFrame, mapping: TableMapping[_ <: Product], sink: RowSink,
      checkpoint: String, decoder: MessageDecoder = graft.sources.JsonDecoder,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // One dead-letter accumulator per pipeline run (not per micro-batch), so
    // the count is cumulative across the stream like the reference's log.
    val deadLetters = stream.sparkSession.sparkContext
      .longAccumulator(DeadLetterAccumulator)
    // Total-seen rides the SAME decode pass (r16, optimization guide §1.2:
    // don't run a second action for a number the first pass already knows).
    // The former `batch.count()` was one extra job + plan per micro-batch —
    // ~30% of the per-batch job count on the one-message-per-batch replay
    // pipelines (p3/p5). Like the dead delta, the total delta is the
    // operational best-effort figure (exact absent task retries); the EXACT
    // contract remains q71's structural row.
    val totalSeen = stream.sparkSession.sparkContext
      .longAccumulator(DeadLetterAccumulator + ".total")
    if (listenerRegistered.add(stream.sparkSession))
      stream.sparkSession.streams.addListener(DeadLetterMetrics.Reporter)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val before = deadLetters.value
        val beforeTotal = totalSeen.value
        val messages = decoded(batch, decoder, Some(deadLetters), Some(totalSeen))
        UpsertSink.writeBatch(mapping.transformWithOffset(messages), mapping, sink)
        // The write above fully consumed the batch, so the accumulator
        // deltas are this batch's dead letters and total messages.
        val dead = deadLetters.value - before
        val total = totalSeen.value - beforeTotal
        DeadLetterMetrics.record(DeadLetterMetrics.BatchMetric(
          checkpoint, batchId, decoder.name, total - dead, dead))
      }
      .start()
  }
}
