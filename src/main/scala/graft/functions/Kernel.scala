package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node._
import scala.jdk.CollectionConverters._
import scala.collection.mutable.LinkedHashMap

/** The per-message transform kernel (SURVEY.md §2.3, T4–T10). Pure Scala on
  * Jackson trees; invoked from each mapping's row UDF over the raw message —
  * the schema-on-read path the survey prescribes for heterogeneous messages.
  */
object Kernel {

  /** T4: recursive flatten (`/root/reference/dbsink/tables.py:30-62`).
    *  - dicts: underscore-joined keys;
    *  - lists: emitted whole at their key AND per-index (`k_0`, `k_0_1`…);
    *  - strings: speculatively decoded (T5) and flattened if they parse.
    * Insertion order preserved (LinkedHashMap), later keys overwrite.
    */
  def flatten(n: JsonNode, parentKey: String = "", sep: String = "_"): LinkedHashMap[String, JsonNode] = {
    val items = LinkedHashMap.empty[String, JsonNode]
    n match {
      case o: ObjectNode =>
        o.fields.asScala.foreach { e =>
          val newKey = if (parentKey.nonEmpty) s"$parentKey$sep${e.getKey}" else e.getKey
          items ++= flatten(e.getValue, newKey, sep)
        }
      case a: ArrayNode =>
        items += parentKey -> a
        a.elements.asScala.zipWithIndex.foreach { case (el, idx) =>
          val newKey = if (parentKey.nonEmpty) s"$parentKey$sep$idx" else idx.toString
          items ++= flatten(el, newKey, sep)
        }
      case s: TextNode =>
        PyJson.expandEmbedded(s.textValue) match {
          case Some(decoded) => items ++= flatten(decoded, parentKey, sep)
          case None          => items += parentKey -> s
        }
      case other =>
        items += parentKey -> other
    }
    items
  }

  // T6 sanitizer regexes (`tables.py:22-23`), replicated including the
  // reference's buggy second pattern (a char class followed by a literal ']').
  private val xx = """[\x00-\x1f\\"]""".r
  private val ux = """[\\u\[0-9A-Fa-f]\]""".r

  private def hasXx(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < ' ' || c == '\\' || c == '"') return true
      i += 1
    }
    false
  }

  /** T6: make_valid_string (`tables.py:128-147`): sanitize strings, Python-
    * `str()` everything else. Each regex/replace pass only runs when a
    * candidate character is present — a plain scan skips them for the
    * overwhelmingly common clean string (per-HSTORE-value hot path). */
  def makeValidString(n: JsonNode): String = n match {
    case s: TextNode =>
      val t = s.textValue
      val afterXx = if (hasXx(t)) xx.replaceAllIn(t, "") else t
      val afterUx =
        if (afterXx.indexOf(']') >= 0) ux.replaceAllIn(afterXx, "") else afterXx
      if (afterUx.indexOf('\u0080') >= 0 || afterUx.indexOf('\u0000') >= 0)
        afterUx.replace("\u0080", "").replace("\u0000", "")
      else afterUx
    case other => PyJson.pyStr(other)
  }

  /** T7: QARTOD point-location quality (`tables.py:82-118`). Box membership
    * uses shapely `within` semantics: interior only (boundary excluded). */
  def locationQuality(
      lon: Double, lat: Double,
      inprecise: Boolean = false,
      disallowLon: Seq[Double] = Nil,
      disallowLat: Seq[Double] = Nil): Int = {
    if (lon > -1 && lon < 1 && lat > -1 && lat < 1) return 4
    if (lon == 0 || lat == 0) return 4
    if (disallowLon.contains(lon)) return 4
    if (disallowLat.contains(lat)) return 4
    val in180 = lon > -180 && lon < 180 && lat > -90 && lat < 90
    val in360 = lon > 0 && lon < 360 && lat > -90 && lat < 90
    if (!in180 && !in360) return 4
    if (inprecise) 3 else 1
  }

  /** T10: dateutil-compatible-enough ISO-8601 parse (`tables.py:184-185` et
    * al.). The reference does `dtparse(x).replace(tzinfo=pytz.utc)`, which
    * DISCARDS any parsed offset and reinterprets the wall-clock time as UTC
    * — so `2019-01-01T12:00:00+05:00` means 12:00 UTC, not 07:00. Returns
    * epoch microseconds. */
  def parseTimeUtc(s: String): Long = {
    import java.time._
    import java.time.format.DateTimeFormatter
    val t = s.trim
    val ldt: LocalDateTime =
      try OffsetDateTime.parse(t, DateTimeFormatter.ISO_OFFSET_DATE_TIME).toLocalDateTime
      catch { case _: Exception =>
        try LocalDateTime.parse(t, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
        catch { case _: Exception =>
          LocalDate.parse(t, DateTimeFormatter.ISO_LOCAL_DATE).atStartOfDay
        }
      }
    val instant = ldt.toInstant(ZoneOffset.UTC)
    instant.getEpochSecond * 1000000L + instant.getNano / 1000L
  }

  /** Epoch-seconds (possibly fractional) → epoch micros
    * (`datetime.fromtimestamp(ts, utc)`, `tables.py:395-399`). */
  def epochToMicros(seconds: Double): Long = math.round(seconds * 1e6)

  /** T3: start/end filter (`tables.py:121-125`): true ⇒ keep. */
  def inWindow(timeUs: Long, startUs: Option[Long], endUs: Option[Long]): Boolean =
    startUs.forall(timeUs >= _) && endUs.forall(timeUs <= _)

  /** T8: degrees + minutes → decimal degrees (`tables.py:410-417`). */
  def degMin(deg: Double, min: Double): Double = deg + min / 60.0

  /** WKT POINT for the geom column (`tables.py:356-357`). */
  def pointWkt(lon: Double, lat: Double): String =
    s"POINT (${PyJson.pyFloatRepr(lon)} ${PyJson.pyFloatRepr(lat)})"
}
