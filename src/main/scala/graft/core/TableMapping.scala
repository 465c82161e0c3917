package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions.col
import com.fasterxml.jackson.databind.JsonNode

/** Time-window filters carried by a mapping (CLI `--start_date/--end_date`,
  * `/root/reference/dbsink/listen.py:41-43,78-82`). Microsecond epochs. */
case class TimeFilters(startUs: Option[Long] = None, endUs: Option[Long] = None)

/** A per-topic table mapping: the pluggable unit of the engine, mirroring the
  * reference's entry-point-registered mapping classes
  * (`/root/reference/setup.cfg:46-56`, `maps.py:22-81`) as a sink-independent
  * `DataFrame => DataFrame` transform (the shape dictated by
  * `utils.listen_unpack`, `utils.py:54-95`).
  *
  * Input contract: a DataFrame with `key: String` and `value: String` (the
  * decoded message text). One output row per surviving message; messages that
  * fail validation/parsing or the time filter are dropped (never fail the
  * job) — `listen.py:145-153`.
  */
abstract class TableMapping[T <: Product : Encoder] extends Serializable {
  def topic: String
  def tableOverride: Option[String] = None
  def filters: TimeFilters = TimeFilters()

  /** Table name: override or topic, `.` → `-` (`maps.py:25`). */
  final def table: String = tableOverride.getOrElse(topic).replace(".", "-")
  private def norm(s: String): String = s.replace("-", "_").toLowerCase
  def upsertConstraintName: Option[String] = Some(norm(s"${table}_unique_constraint"))
  final def uniqueIndexName: String = norm(s"${table}_unique_idx")
  final def sequenceName: String = norm(s"${table}_id_seq")

  /** Natural-key columns backing the upsert constraint (K2/T17). */
  def upsertKeys: Option[Seq[String]]

  /** Per-message transform; None ⇒ drop (filtered or invalid). */
  def mapMessage(key: String, rawValue: String): Option[T]

  def encoder: Encoder[T] = implicitly[Encoder[T]]

  /** The whole-mapping dataflow as a declarative transform. The per-message
    * work is genuinely schema-on-read row logic (heterogeneous messages), so
    * it runs in a typed `flatMap` — a single narrow map stage, no shuffle;
    * at 100 TB it scales with input partitions. */
  def transform(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("key", "value").as[(String, String)]
      .flatMap { case (k, v) => mapMessage(k, v) }(encoder)
      .toDF()
  }

  /** Transform carrying the stream position (`__offset`) through, so the
    * sink can re-establish the reference's sequential last-wins semantics
    * inside an unordered micro-batch (SURVEY.md §7 hard part 4). */
  def transformWithOffset(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[(T, Long)] = Encoders.tuple(encoder, Encoders.scalaLong)
    df.select("key", "value", "__offset").as[(String, String, Long)]
      .flatMap { case (k, v, o) => mapMessage(k, v).map(t => (t, o)) }
      .toDF("row", "__offset")
      .select(col("row.*"), col("__offset"))
  }
}

object TableMapping {
  /** The CLI `--table` override (`listen.py:59-61`): same dataflow, renamed
    * table (and hence renamed constraint/index, which derive from it). */
  def withTable[T <: Product](m: TableMapping[T], tbl: String): TableMapping[T] = {
    implicit val enc: Encoder[T] = m.encoder
    new TableMapping[T] {
      def topic: String = m.topic
      override def tableOverride: Option[String] = Some(tbl)
      override def filters: TimeFilters = m.filters
      // Keyed mappings get the name re-derived from the overridden table;
      // append-only mappings (None) stay constraint-less.
      override def upsertConstraintName: Option[String] =
        m.upsertConstraintName.map(_ => super.upsertConstraintName.get)
      def upsertKeys: Option[Seq[String]] = m.upsertKeys
      def mapMessage(key: String, raw: String): Option[T] = m.mapMessage(key, raw)
    }
  }
}

/** Third-party mapping plugin: implement and list the class in
  * `META-INF/services/graft.core.MappingProvider` — the JVM analogue of the
  * reference's setuptools entry-point registration (`setup.cfg:46-56`). */
trait MappingProvider {
  def name: String
  def create(topic: String, filters: TimeFilters): TableMapping[_ <: Product]
}

/** Registry of named mappings (reference: setuptools entry points,
  * `setup.cfg:46-56`, `listen.py:17-20`; built-ins plus
  * `java.util.ServiceLoader`-discovered [[MappingProvider]]s). */
object MappingRegistry {
  import graft.tables._
  import scala.jdk.CollectionConverters._

  private def loaded(topic: String, filters: TimeFilters): Map[String, TableMapping[_ <: Product]] =
    java.util.ServiceLoader.load(classOf[MappingProvider]).asScala
      .map(p => p.name -> p.create(topic, filters)).toMap

  def builtin(topic: String, filters: TimeFilters = TimeFilters()): Map[String, TableMapping[_ <: Product]] = loaded(topic, filters) ++ Map(
    "StringMap" -> new StringMap(topic, filters),
    "JsonMap" -> new JsonMap(topic, filters),
    "GenericFieldStatistic" -> new GenericFieldStatistic(topic, filters),
    "GenericGeography" -> new GenericGeography(topic, filters),
    "GenericFloat" -> new GenericFloat(topic, filters),
    "AreteData" -> new AreteData(topic, filters),
    "NumurusData" -> new NumurusData(topic, filters),
    "NumurusStatus" -> new NumurusStatus(topic, filters),
    "NwicFloatReports" -> new NwicFloatReports(topic, filters),
    "NwicFloatReportsSofar" -> new NwicFloatReportsSofar(topic, filters)
  )

  def lookup(name: String, topic: String, filters: TimeFilters = TimeFilters()): TableMapping[_ <: Product] =
    builtin(topic, filters).getOrElse(name,
      throw new IllegalArgumentException(s"unknown mapping: $name"))
}
