package graft.tables

import java.sql.Timestamp
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, NullNode, ObjectNode, TextNode}
import org.apache.spark.sql.{Encoder, Encoders}
import scala.jdk.CollectionConverters._
import scala.collection.mutable.LinkedHashMap

import graft.core.{TableMapping, TimeFilters}
import graft.functions.{Kernel, PyJson}
import graft.geo.GeoJson

/** Row types of the concrete mappings (reference schemas in
  * `/root/reference/dbsink/maps.py:58-63` and `tables.py:150-342`). The
  * auto-increment `id` column is sink-side (identity DDL), not part of the
  * DataFrame. `geom` is WKT text (PostGIS cast happens in the sink DDL). */
case class FloatRow(uid: String, gid: Option[String], time: Timestamp,
    reftime: Timestamp, lat: Option[Double], lon: Option[Double],
    z: Option[Double], geom: Option[String], values: Map[String, String],
    payload: String)

case class GeoRow(uid: Option[String], gid: Option[String], time: Timestamp,
    reftime: Timestamp, values: Map[String, String], payload: String,
    geom: Option[String])

case class StatRow(source: String, period: Option[String], starting: Timestamp,
    ending: Timestamp, values: String)

case class KvRow(sinked: Timestamp, key: String, payload: String)

/** Jackson helpers shared by the mappings. */
private[tables] object Msg {
  def parse(raw: String): JsonNode = PyJson.parse(raw)

  def opt(n: JsonNode, k: String): Option[JsonNode] =
    Option(n.get(k)).filterNot(_.isNull)

  /** Python truthiness of a JSON value. */
  def truthy(n: JsonNode): Boolean = n match {
    case null => false
    case _: NullNode => false
    case b if b.isBoolean => b.asBoolean
    case v if v.isNumber => v.asDouble != 0.0
    case s: TextNode => s.textValue.nonEmpty
    case a: ArrayNode => a.size > 0
    case o: ObjectNode => o.size > 0
    case _ => true
  }

  def asDouble(n: JsonNode): Double =
    if (n.isNumber) n.asDouble
    else if (n.isTextual) n.textValue.toDouble
    else throw new IllegalArgumentException(s"not a number: $n")

  /** `str()` coercion for string columns fed non-strings (psycopg-style). */
  def asStr(n: JsonNode): String =
    if (n.isTextual) n.textValue else PyJson.pyStr(n)

  def ts(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def nowTs(truncateToSecond: Boolean = false): Timestamp = {
    val ms = System.currentTimeMillis()
    new Timestamp(if (truncateToSecond) ms / 1000 * 1000 else ms)
  }

  /** HSTORE stringify preserving None (`tables.py:290-294` et al.). */
  def hstore(m: LinkedHashMap[String, JsonNode]): Map[String, String] =
    m.map { case (k, v) =>
      k -> (if (v == null || v.isNull) null else Kernel.makeValidString(v))
    }.toMap
}

/** StringMap (`/root/reference/dbsink/maps.py:122-154`): append-only
  * (key, stringified payload). */
class StringMap(val topic: String, override val filters: TimeFilters = TimeFilters())
    extends TableMapping[KvRow]()(Encoders.product[KvRow]) {
  override def upsertConstraintName: Option[String] = None
  def upsertKeys: Option[Seq[String]] = None
  def mapMessage(key: String, raw: String): Option[KvRow] =
    try Some(KvRow(Msg.nowTs(), key, PyJson.writePy(Msg.parse(raw))))
    catch { case _: Exception => None }
}

/** JsonMap (`maps.py:84-119`): append-only (key, canonical JSONB payload),
  * NaN/Infinity scrubbed to null (T2). */
class JsonMap(val topic: String, override val filters: TimeFilters = TimeFilters())
    extends TableMapping[KvRow]()(Encoders.product[KvRow]) {
  override def upsertConstraintName: Option[String] = None
  def upsertKeys: Option[Seq[String]] = None
  def mapMessage(key: String, raw: String): Option[KvRow] =
    try Some(KvRow(Msg.nowTs(), key, PyJson.canonical(Msg.parse(raw))))
    catch { case _: Exception => None }
}

/** GenericFieldStatistic (`tables.py:150-203`): interval statistics with a
  * two-sided window filter; values column keeps the message's `values`
  * subtree as canonical JSON. Upsert key (source, period, starting, ending). */
class GenericFieldStatistic(val topic: String, override val filters: TimeFilters = TimeFilters())
    extends TableMapping[StatRow]()(Encoders.product[StatRow]) {
  def upsertKeys: Option[Seq[String]] = Some(Seq("source", "period", "starting", "ending"))

  def mapMessage(key: String, raw: String): Option[StatRow] = try {
    val v = Msg.parse(raw)
    val starting = Kernel.parseTimeUtc(v.get("starting").asText)
    val ending = Kernel.parseTimeUtc(v.get("ending").asText)
    // starting ≤ end_date AND ending ≥ start_date (`tables.py:187-200`)
    if (!Kernel.inWindow(starting, None, filters.endUs)) return None
    if (!Kernel.inWindow(ending, filters.startUs, None)) return None
    Some(StatRow(
      v.get("source").asText,
      Msg.opt(v, "period").map(_.asText),
      Msg.ts(starting), Msg.ts(ending),
      Msg.opt(v, "values").map(n => PyJson.canonical(n)).getOrElse("null")))
  } catch { case _: Exception => None }
}

/** GenericGeography (`tables.py:206-304`): GeoJSON normalize (T14), JTS
  * unary union (T15), property merge into HSTORE (T16). Upsert (uid,gid,time). */
class GenericGeography(val topic: String, override val filters: TimeFilters = TimeFilters())
    extends TableMapping[GeoRow]()(Encoders.product[GeoRow]) {
  def upsertKeys: Option[Seq[String]] = Some(Seq("uid", "gid", "time"))

  private val tops = Set("id", "uid", "gid", "time", "reftime", "values", "payload", "geom", "geojson")

  def mapMessage(key: String, raw: String): Option[GeoRow] = try {
    val v = Msg.parse(raw)
    val payload = PyJson.canonical(v)
    val topTime = Kernel.parseTimeUtc(v.get("time").asText)
    if (!Kernel.inWindow(topTime, filters.startUs, filters.endUs)) return None

    val geojson = v.get("geojson") match {
      case t: TextNode => PyJson.parse(t.textValue)
      case other       => other
    }
    val features: Seq[JsonNode] =
      if (geojson.has("features")) geojson.get("features").elements.asScala.toSeq
      else if (geojson.has("coordinates")) {
        val f = PyJson.mapper.createObjectNode()
        f.put("type", "Feature")
        f.set[JsonNode]("properties", PyJson.mapper.createObjectNode())
        f.set[JsonNode]("geometry", geojson)
        Seq(f)
      } else if (geojson.has("geometry")) Seq(geojson)
      else Seq.empty

    val geomWkt = GeoJson.unionWkt(features.map(f => GeoJson.toJts(f.get("geometry"))))

    // values: feature properties in order ← message `values` ← leftover tops
    val values = LinkedHashMap.empty[String, JsonNode]
    features.foreach { f =>
      f.get("properties").fields.asScala.foreach(e => values += e.getKey -> e.getValue)
    }
    Msg.opt(v, "values").foreach(_.fields.asScala.foreach(e => values += e.getKey -> e.getValue))
    // Leftover top-level keys override and are stringified eagerly — a null
    // here becomes the string 'None' (str(None)), unlike feature properties,
    // whose nulls stay NULL (`tables.py:285-294`).
    v.fields.asScala.foreach { e =>
      if (!tops.contains(e.getKey))
        values += e.getKey -> new TextNode(Kernel.makeValidString(e.getValue))
    }

    val reftime = Msg.opt(v, "reftime").map(r => Kernel.parseTimeUtc(r.asText)).getOrElse(topTime)
    Some(GeoRow(
      Msg.opt(v, "uid").map(Msg.asStr),
      Msg.opt(v, "gid").map(Msg.asStr),
      Msg.ts(topTime), Msg.ts(reftime),
      Msg.hstore(values), payload, Some(geomWkt)))
  } catch { case _: Exception => None }
}

/** GenericFloat (`tables.py:307-376`): canonical float-track row with QARTOD
  * location quality (T7). Upsert (uid,gid,time,lat,lon,z). Note: this mapping
  * stringifies `values` unconditionally (None → 'None'), unlike its
  * subclasses — faithful to `tables.py:361-363`. */
class GenericFloat(val topic: String, override val filters: TimeFilters = TimeFilters())
    extends TableMapping[FloatRow]()(Encoders.product[FloatRow]) {
  def upsertKeys: Option[Seq[String]] = Some(Seq("uid", "gid", "time", "lat", "lon", "z"))

  def mapMessage(key: String, raw: String): Option[FloatRow] = try {
    val v = Msg.parse(raw)
    val payload = PyJson.canonical(v)
    val topTime = Kernel.parseTimeUtc(v.get("time").asText)
    if (!Kernel.inWindow(topTime, filters.startUs, filters.endUs)) return None
    val lat = Msg.asDouble(v.get("lat"))
    val lon = Msg.asDouble(v.get("lon"))

    val values = LinkedHashMap.empty[String, JsonNode]
    val raws = v.get("values") // KeyError semantics: missing key ⇒ skip
    if (raws == null) throw new NoSuchElementException("values")
    if (Msg.truthy(raws)) raws.fields.asScala.foreach(e => values += e.getKey -> e.getValue)
    values += "location_quality" -> new com.fasterxml.jackson.databind.node.IntNode(
      Kernel.locationQuality(lon, lat))
    val strValues = values.map { case (k, n) => k -> Kernel.makeValidString(n) }.toMap

    val reftime = Msg.opt(v, "reftime").map(r => Kernel.parseTimeUtc(r.asText)).getOrElse(topTime)
    Some(FloatRow(
      Msg.opt(v, "uid").map(Msg.asStr).orNull,
      Msg.opt(v, "gid").map(Msg.asStr),
      Msg.ts(topTime), Msg.ts(reftime),
      Some(lat), Some(lon),
      Msg.opt(v, "z").map(Msg.asDouble),
      Some(Kernel.pointWkt(lon, lat)),
      strValues, payload))
  } catch { case _: Exception => None }
}

/** Base for the flatten-driven GenericFloat subclasses. */
abstract class FlattenedFloat(topic: String, filters: TimeFilters)
    extends GenericFloat(topic, filters) {

  protected def get(values: LinkedHashMap[String, JsonNode], k: String): Option[JsonNode] =
    values.get(k).filterNot(_.isNull)

  protected def truthyGet(values: LinkedHashMap[String, JsonNode], k: String): Option[JsonNode] =
    values.get(k).filter(Msg.truthy)

  /** Final HSTORE pass: stringify, preserving None (`tables.py:443-463`). */
  protected def hstoreOut(values: LinkedHashMap[String, JsonNode],
      extra: (String, String)*): Map[String, String] = {
    val m = LinkedHashMap.empty[String, String]
    values.foreach { case (k, n) =>
      m += k -> (if (n == null || n.isNull) null else Kernel.makeValidString(n))
    }
    extra.foreach { case (k, s) => m += k -> s }
    m.toMap
  }
}

/** AreteData (`tables.py:379-463`): drops not_decoded/Compressed_Data from
  * the nested json, flattens (T4/T5), Iridium deg+min fallback position (T8/
  * T9), imprecise-location QARTOD, mfr='arete'. */
class AreteData(topic: String, filters: TimeFilters = TimeFilters())
    extends FlattenedFloat(topic, filters) {

  override def mapMessage(key: String, raw: String): Option[FloatRow] = try {
    val v = Msg.parse(raw).asInstanceOf[ObjectNode]
    val json = v.get("json") match {
      case o: ObjectNode => o
      case _ => throw new NoSuchElementException("json")
    }
    Seq("not_decoded", "Compressed_Data").foreach(json.remove)
    val payload = PyJson.canonical(v)
    val values = Kernel.flatten(v)

    val reftimeUs = Kernel.epochToMicros(Msg.asDouble(values("headers_iridium_ts")))
    val timeUs = truthyGet(values, "headers_status_ts")
      .map(n => Kernel.epochToMicros(Msg.asDouble(n))).getOrElse(reftimeUs)
    if (!Kernel.inWindow(timeUs, filters.startUs, filters.endUs)) return None

    var inprecise = true
    var latdd = Kernel.degMin(Msg.asDouble(values("headers_location_latitude_degrees")),
      Msg.asDouble(values("headers_location_latitude_minutes")))
    var londd = Kernel.degMin(Msg.asDouble(values("headers_location_longitude_degrees")),
      Msg.asDouble(values("headers_location_longitude_minutes")))
    values.get("json_Full_ll") match {
      case Some(a: ArrayNode) =>
        latdd = a.get(0).asDouble; londd = a.get(1).asDouble; inprecise = false
      case _ =>
        (get(values, "json_position_latitude"), get(values, "json_position_longitude")) match {
          case (Some(la), Some(lo)) =>
            latdd = Msg.asDouble(la); londd = Msg.asDouble(lo); inprecise = false
          case _ =>
        }
    }

    val quality = Kernel.locationQuality(londd, latdd, inprecise = inprecise)
    Some(FloatRow(
      Msg.asStr(values("headers_imei")), None,
      Msg.ts(timeUs), Msg.ts(reftimeUs),
      Some(latdd), Some(londd), None,
      Some(Kernel.pointWkt(londd, latdd)),
      hstoreOut(values, "location_quality" -> quality.toString, "mfr" -> "arete"),
      payload))
  } catch { case _: Exception => None }
}

/** NumurusData (`tables.py:466-526`): flatten, timestamp/navsat times,
  * disallowed lat 91 / lon 181, pipeline keys skipped from HSTORE. */
class NumurusData(topic: String, filters: TimeFilters = TimeFilters())
    extends FlattenedFloat(topic, filters) {

  protected def skips: Set[String] = Set(
    "data_segment_data_product_pipeline",
    "data_segment_data_segment_data_product_pipeline")

  override def mapMessage(key: String, raw: String): Option[FloatRow] = try {
    val v = Msg.parse(raw)
    val payload = PyJson.canonical(v)
    val values = Kernel.flatten(v)

    val timeUs = Kernel.parseTimeUtc(values("timestamp").asText)
    if (!Kernel.inWindow(timeUs, filters.startUs, filters.endUs)) return None
    val reftimeUs = Kernel.parseTimeUtc(values("navsat_fix_time").asText)
    val lat = Msg.asDouble(values("latitude"))
    val lon = Msg.asDouble(values("longitude"))

    val quality = Kernel.locationQuality(lon, lat, disallowLon = Seq(181), disallowLat = Seq(91))
    val kept = values.filterNot { case (k, _) => skips.contains(k) }
    Some(FloatRow(
      Msg.asStr(values("imei")), None,
      Msg.ts(timeUs), Msg.ts(reftimeUs),
      Some(lat), Some(lon), None,
      Some(Kernel.pointWkt(lon, lat)),
      hstoreOut(kept, "location_quality" -> quality.toString, "mfr" -> "numurus"),
      payload))
  } catch { case _: Exception => None }
}

/** NumurusStatus (`tables.py:529-581`): NumurusData without the skip list. */
class NumurusStatus(topic: String, filters: TimeFilters = TimeFilters())
    extends NumurusData(topic, filters) {
  override protected def skips: Set[String] = Set.empty
}

/** NwicFloatReports (`tables.py:584-654`): 3-way timestamp fallback chain,
  * Iridium deg+min fallback position, imprecise QARTOD. */
class NwicFloatReports(topic: String, filters: TimeFilters = TimeFilters())
    extends FlattenedFloat(topic, filters) {

  override def mapMessage(key: String, raw: String): Option[FloatRow] = try {
    val v = Msg.parse(raw)
    val payload = PyJson.canonical(v)
    val values = Kernel.flatten(v)

    val reftimeUs = Kernel.epochToMicros(Msg.asDouble(values("headers_iridium_ts")))
    val timeUs = Seq("values_status_ts", "values_environmental_ts", "values_mission_ts")
      .view.flatMap(k => truthyGet(values, k)).headOption
      .map(n => Kernel.epochToMicros(Msg.asDouble(n))).getOrElse(reftimeUs)
    if (!Kernel.inWindow(timeUs, filters.startUs, filters.endUs)) return None

    var inprecise = true
    var latdd = Kernel.degMin(Msg.asDouble(values("headers_location_latitude_degrees")),
      Msg.asDouble(values("headers_location_latitude_minutes")))
    var londd = Kernel.degMin(Msg.asDouble(values("headers_location_longitude_degrees")),
      Msg.asDouble(values("headers_location_longitude_minutes")))
    (truthyGet(values, "values_latitude"), truthyGet(values, "values_longitude")) match {
      case (Some(la), Some(lo)) =>
        latdd = Msg.asDouble(la); londd = Msg.asDouble(lo); inprecise = false
      case _ =>
    }

    val quality = Kernel.locationQuality(londd, latdd, inprecise = inprecise)
    Some(FloatRow(
      Msg.asStr(values("headers_imei")), None,
      Msg.ts(timeUs), Msg.ts(reftimeUs),
      Some(latdd), Some(londd), None,
      Some(Kernel.pointWkt(londd, latdd)),
      hstoreOut(values, "location_quality" -> quality.toString),
      payload))
  } catch { case _: Exception => None }
}

/** NwicFloatReportsSofar (`tables.py:657-708`): spotterId[5:] → uid,
  * reftime = now (second precision), `message` dropped from payload only,
  * no location-quality flag; rows without lat/lon are dropped (the reference
  * crashes on Point(None, None) and skips the message). */
class NwicFloatReportsSofar(topic: String, filters: TimeFilters = TimeFilters())
    extends FlattenedFloat(topic, filters) {

  override def mapMessage(key: String, raw: String): Option[FloatRow] = try {
    val v = Msg.parse(raw)
    // flatten BEFORE the payload-only `message` pop: scrubNonFinite may
    // return the original tree (copy-on-need), so the values must be
    // captured first — they keep referencing the detached node either way.
    val values = Kernel.flatten(v)
    val payloadNode = PyJson.scrubNonFinite(v).asInstanceOf[ObjectNode]
    payloadNode.remove("message")
    val payload = PyJson.writePy(payloadNode)

    val timeUs = Kernel.parseTimeUtc(values("timestamp").asText)
    val (latdd, londd) =
      (truthyGet(values, "latitude"), truthyGet(values, "longitude")) match {
        case (Some(la), Some(lo)) => (Msg.asDouble(la), Msg.asDouble(lo))
        case _ => throw new IllegalArgumentException("missing position")
      }

    val uidFull = Msg.asStr(values("spotterId"))
    Some(FloatRow(
      uidFull.drop(5), None,
      Msg.ts(timeUs), Msg.nowTs(truncateToSecond = true),
      Some(latdd), Some(londd), None,
      Some(Kernel.pointWkt(londd, latdd)),
      hstoreOut(values),
      payload))
  } catch { case _: Exception => None }
}
