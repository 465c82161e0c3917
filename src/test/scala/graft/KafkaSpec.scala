package graft

import graft.streaming.Pipeline

/** S1 Kafka source coverage.
  *
  * The spark-sql-kafka connector jar is absent from this offline image
  * (environment fact, SURVEY.md §7), so the suite splits in two:
  *  - option assembly ([[Pipeline.kafkaOptions]]) is pure data — tested
  *    unconditionally, pinning parity with the reference's consumer
  *    construction (`/root/reference/dbsink/utils.py:17-31`);
  *  - end-to-end activation (format resolution + the connector's fixed
  *    output schema) runs only when the jar IS on the classpath and is
  *    CANCELED (not failed) otherwise, so the same suite is green offline
  *    and asserts the real wiring on a deploy classpath.
  */
class KafkaSpec extends SparkTestBase {

  private val kafkaJarPresent: Boolean =
    // LinkageError too: a PARTIALLY present connector (jar without its
    // transitive kafka-clients) throws NoClassDefFoundError, which would
    // abort the whole suite — including the jar-free option tests — if
    // only ClassNotFoundException were handled.
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch {
      case _: ClassNotFoundException => false
      case _: LinkageError => false
    }

  test("kafka options: defaults mirror the reference consumer construction") {
    val opts = Pipeline.kafkaOptions("b1:9092,b2:9092", "topicA")
    assert(opts("kafka.bootstrap.servers") == "b1:9092,b2:9092")
    assert(opts("subscribe") == "topicA")
    assert(opts("startingOffsets") == "latest")
    // random group: dbsink-{topic}- prefix + 20 hex chars (uuid4().hex[0:20])
    val group = opts("kafka.group.id")
    assert(group.startsWith("dbsink-topicA-"))
    val suffix = group.stripPrefix("dbsink-topicA-")
    assert(suffix.length == 20 && suffix.forall(c => c.isDigit || ('a' to 'f').contains(c)), group)
    // and a fresh group per call (the reference regenerates per run)
    assert(Pipeline.kafkaOptions("b", "topicA")("kafka.group.id") != group)
  }

  test("kafka options: librdkafka offset aliases translate; explicit group passes through") {
    assert(Pipeline.kafkaOptions("b", "t", offset = "largest")("startingOffsets") == "latest")
    assert(Pipeline.kafkaOptions("b", "t", offset = "smallest")("startingOffsets") == "earliest")
    assert(Pipeline.kafkaOptions("b", "t", offset = "earliest")("startingOffsets") == "earliest")
    val opts = Pipeline.kafkaOptions("b", "t", consumerGroup = Some("my-group"))
    assert(opts("kafka.group.id") == "my-group")
  }

  test("kafka source activates end-to-end (jar-gated; canceled offline)") {
    assume(kafkaJarPresent,
      "spark-sql-kafka-0-10 not on the classpath (offline image) — " +
        "see README 'Deploying against Kafka'")
    // No broker needed: load() resolves the provider and fixes the schema
    // without connecting (connections happen at stream start).
    val df = Pipeline.kafkaSource(spark, "localhost:9092", "topicA", offset = "earliest")
    assert(df.isStreaming)
    val cols = df.schema.fieldNames.toSet
    assert(Set("key", "value", "topic", "partition", "offset", "timestamp").subsetOf(cols), cols)
    // the decode chain accepts the connector's (key, value, offset) contract
    val messages = Pipeline.decoded(df.select("key", "value", "offset"), graft.sources.JsonDecoder)
    assert(messages.columns.toSeq == Seq("key", "value", "__offset"))
  }
}
