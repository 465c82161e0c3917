package graft.geo

import com.fasterxml.jackson.databind.JsonNode
import org.locationtech.jts.geom._
import org.locationtech.jts.operation.union.UnaryUnionOp
import scala.jdk.CollectionConverters._

/** Minimal GeoJSON-geometry → JTS converter + unary union (T14/T15,
  * `/root/reference/dbsink/tables.py:247-269`). Coordinates are taken as-is
  * (no longitude normalization — the reference stores 0–360 longitudes
  * untouched, `tables.py:26-27` and the envelopes fixture). */
object GeoJson {
  private val gf = new GeometryFactory(new PrecisionModel(), 4326)

  private def coord(n: JsonNode): Coordinate =
    new Coordinate(n.get(0).asDouble, n.get(1).asDouble)

  private def coords(n: JsonNode): Array[Coordinate] =
    n.elements.asScala.map(coord).toArray

  def toJts(g: JsonNode): Geometry = g.get("type").asText match {
    case "Point"      => gf.createPoint(coord(g.get("coordinates")))
    case "MultiPoint" => gf.createMultiPointFromCoords(coords(g.get("coordinates")))
    case "LineString" => gf.createLineString(coords(g.get("coordinates")))
    case "MultiLineString" =>
      gf.createMultiLineString(
        g.get("coordinates").elements.asScala.map(c => gf.createLineString(coords(c))).toArray)
    case "Polygon" => polygon(g.get("coordinates"))
    case "MultiPolygon" =>
      gf.createMultiPolygon(
        g.get("coordinates").elements.asScala.map(polygon).toArray)
    case "GeometryCollection" =>
      gf.createGeometryCollection(
        g.get("geometries").elements.asScala.map(toJts).toArray)
    case other => throw new IllegalArgumentException(s"unsupported geometry: $other")
  }

  private def polygon(rings: JsonNode): Polygon = {
    val all = rings.elements.asScala.map(r => gf.createLinearRing(coords(r))).toArray
    gf.createPolygon(all.head, all.tail)
  }

  /** `unary_union` of all feature geometries → WKT (`tables.py:266-269`). */
  def unionWkt(geoms: Seq[Geometry]): String =
    UnaryUnionOp.union(geoms.asJava).toText
}
