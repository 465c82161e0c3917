package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.core.JsonGenerator
import scala.jdk.CollectionConverters._

import graft.functions.PyJson

/** S2 — file replay source (`/root/reference/dbsink/listen.py:173-177`):
  * read a JSON array file, re-pack each element, and feed the same transform
  * path as the streaming source. This is how the reference's entire test
  * suite runs, and how ours does too.
  *
  * Elements are re-serialized preserving bare NaN/Infinity tokens (simplejson
  * round-trip parity for the null_infinity fixture) and fed as a
  * (key, value) DataFrame — the engine-wide message contract.
  */
object FileReplay {

  private lazy val rawMapper = {
    val m = PyJson.mapper.copy()
    m.configure(JsonGenerator.Feature.QUOTE_NON_NUMERIC_NUMBERS, false)
    m
  }

  /** Parse the array file into raw message strings (driver-side; fixture
    * files are small — the scale path is the Kafka/stream source, S1). */
  def messages(path: String): Seq[String] = {
    val tree = rawMapper.readTree(new java.io.File(path))
    tree.elements.asScala.map(rawMapper.writeValueAsString).toSeq
  }

  /** As a (key, value, __offset) DataFrame with a constant key (the
    * reference feeds `--datafile` messages with no Kafka key). `__offset`
    * is the element's position in the file — an explicit stream-position
    * column so replay shares the streaming path's last-wins contract
    * (dedup orders by it) instead of relying on planner placement of
    * `monotonically_increasing_id()`. Consumers that only need (key,
    * value) — `TableMapping.transform` — simply don't select it. */
  def read(spark: SparkSession, path: String, key: String = "fake"): DataFrame = {
    import spark.implicits._
    messages(path).zipWithIndex.map { case (v, i) => (key, v, i.toLong) }
      .toDF("key", "value", "__offset")
  }
}
