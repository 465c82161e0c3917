package graft

import org.apache.spark.sql.Row
import graft.core.TimeFilters
import graft.functions.{Kernel, PyJson}
import graft.sources.FileReplay
import graft.tables._

/** Fixture-replay golden tests, mirroring the reference's unit suite
  * (`/root/reference/tests/test_dbsink.py`) over the same JSON fixtures,
  * read in place from the read-only reference checkout. */
class MappingFixtureSpec extends SparkTestBase {

  private val fx = "/root/reference/tests"

  private def run(mapping: graft.core.TableMapping[_ <: Product], file: String): Array[Row] =
    mapping.transform(FileReplay.read(spark, s"$fx/$file")).collect()

  private def vmap(r: Row): Map[String, String] =
    r.getAs[Map[String, String]]("values")

  private def tsOf(s: String): java.sql.Timestamp =
    new java.sql.Timestamp(java.time.Instant.parse(s).toEpochMilli)

  test("ncreplayer: GenericFloat keeps 4 rows, time == reftime") {
    val rows = run(new GenericFloat("axds-netcdf-replayer-data"), "replayer.json")
    assert(rows.length == 4)
    assert(rows(0).getAs[java.sql.Timestamp]("time") == rows(0).getAs[java.sql.Timestamp]("reftime"))
  }

  test("mission_sensors: NwicFloatReports keeps 10 rows") {
    assert(run(new NwicFloatReports("oot.reports.mission_sensors"), "mission_sensors.json").length == 10)
  }

  test("environmental: NwicFloatReports keeps 10 rows") {
    assert(run(new NwicFloatReports("oot.reports.environmental"), "environmental.json").length == 10)
  }

  test("null_infinity: JsonMap scrubs Infinity to null") {
    val rows = run(new JsonMap("whatever"), "null_infinity.json")
    assert(rows.length == 2)
    rows.foreach { r =>
      val payload = PyJson.parse(r.getAs[String]("payload"))
      assert(payload.get("bus_voltage").isNull, s"expected null bus_voltage in $payload")
    }
  }

  test("null_infinity: StringMap keeps bare Infinity (simplejson json.dumps parity)") {
    // The reference's StringMap does NOT payload_parse: `json.dumps(value)`
    // (`maps.py:151`) serializes non-finite floats as bare tokens.
    val rows = run(new StringMap("whatever"), "null_infinity.json")
    assert(rows.length == 2)
    assert(rows.exists(_.getAs[String]("payload").contains(":Infinity")),
      rows.map(_.getAs[String]("payload")).mkString("\n"))
  }

  test("health_and_status: NwicFloatReports goldens") {
    val rows = run(new NwicFloatReports("foo"), "health_and_status.json")
    assert(rows.length == 516)

    val m1 = rows.head
    assert(m1.getAs[String]("uid") == "300434063547170")
    assert(m1.getAs[Double]("lat") == 32.704426)
    assert(m1.getAs[Double]("lon") == -117.23662)
    assert(m1.getAs[java.sql.Timestamp]("time") == tsOf("2019-05-31T20:39:50Z"))
    val v1 = vmap(m1)
    assert(v1("values_status_ts") == "1559335190")
    assert(v1("headers_iridium_ts") == "1559335196")
    assert(v1("headers_location_latitude_degrees") == "32")
    assert(v1("headers_location_longitude_degrees") == "-117")
    assert(v1("values_latitude") == "32.704426")
    assert(v1("values_longitude") == "-117.23662")
    assert(v1("values_misc_speed") == "2.72")
    assert(v1("values_misc_test_num") == "T240")
    assert(v1("mfr") == "usna")

    val m2 = rows.last
    assert(m2.getAs[String]("uid") == "300434063946390")
    assert(m2.getAs[Double]("lat") == 39.01338)
    assert(m2.getAs[Double]("lon") == -75.47597)
    assert(m2.getAs[java.sql.Timestamp]("time") == tsOf("2019-06-06T18:19:56Z"))
    val v2 = vmap(m2)
    assert(!v2.contains("status_ts"))
    assert(v2("headers_iridium_ts") == "1559845196")
    assert(v2("headers_location_latitude_degrees") == "39")
    assert(v2("headers_location_longitude_degrees") == "-76")
    assert(!v2.contains("latitude"))
    assert(v2.contains("values_longitude") && v2("values_longitude") == null)
    assert(v2("values_misc_speed") == "0.01")
    assert(v2("values_misc_test_num") == "T76")
    assert(v2("mfr") == "usna")
  }

  test("numurus_status: 87 of 184 survive; lat=91 row flagged 4") {
    val rows = run(new NumurusStatus("topic"), "numurus.status.json")
    assert(rows.length == 87)
    assert(vmap(rows.last)("location_quality") == "4")
  }

  test("numurus_data: goldens incl. python-repr list stringify") {
    val rows = run(new NumurusData("topic"), "numurus.data.json")
    assert(rows.length == 8)
    val v = vmap(rows.head)
    assert(v("data_segment_data_0") == "33")
    assert(v("data_segment_data") == "[33, 1, 1, 1, 0, 0, 0, 0, 0]")
    assert(rows.head.getAs[Double]("lat") == 47.550865)
    assert(rows.head.getAs[Double]("lon") == -122.377328)
    assert(!v.contains("data_segment_data_product_pipeline"))
  }

  test("numurus_data date filter") {
    val f = TimeFilters(
      startUs = Some(Kernel.parseTimeUtc("2019-07-18T15:00:00Z")),
      endUs = Some(Kernel.parseTimeUtc("2019-07-18T16:00:00Z")))
    assert(run(new NumurusData("topic", f), "numurus.data.json").length == 2)
  }

  test("arete_data: 137 rows with position fallback goldens") {
    val rows = run(new AreteData("topic"), "arete_data.json")
    assert(rows.length == 137)
    val n = rows.length
    assert(rows(n - 5).getAs[Double]("lat") == 38.859378814697266)
    assert(rows(n - 5).getAs[Double]("lon") == -77.0494384765625)
    assert(rows(n - 4).getAs[Double]("lat") == 32.70533)
    assert(rows(n - 4).getAs[Double]("lon") == -117.23613)
    assert(rows(n - 3).getAs[Double]("lat") == 532.6271)
    assert(rows(n - 3).getAs[Double]("lon") == -117.89201)
    assert(vmap(rows(n - 3))("location_quality") == "4")
    assert(rows(n - 2).getAs[Double]("lat") == 32.627373)
    assert(rows(n - 2).getAs[Double]("lon") == -117.91643)
    assert(rows(n - 1).getAs[Double]("lat") == 32.62755)
    assert(rows(n - 1).getAs[Double]("lon") == -117.94065)
  }

  test("arete_data date filter") {
    val f = TimeFilters(startUs = Some(Kernel.parseTimeUtc("2019-08-09T00:00:00Z")))
    assert(run(new AreteData("topic", f), "arete_data.json").length == 14)
  }

  test("just_json: JsonMap payload round-trips mission_sensors structure") {
    val rows = run(new JsonMap("topic"), "mission_sensors.json")
    assert(rows.length == 10)
    assert(rows.head.getAs[String]("key") == "fake")
    val payload = PyJson.parse(rows.head.getAs[String]("payload"))
    assert(payload.get("cdr_reference").asLong == -5699810423388316158L)
    assert(payload.get("headers").get("location").get("latitude").get("degrees").asInt == 34)
    assert(payload.get("values").get("misc").isNull)
    assert(payload.get("mfr").asText == "Numerus")
  }

  test("geography: driftworker + scuttle fixtures") {
    assert(run(new GenericGeography("topic"), "driftworker-traj-ind.json").length == 10)
    assert(run(new GenericGeography("topic"), "driftworker-traj-multi.json").length == 1)
    assert(run(new GenericGeography("topic"), "driftworker-envelopes.json").length == 4)
    val rows = run(new GenericGeography("topic"), "scuttle-watch-regions.json")
    assert(rows.length == 6)
    assert(rows(0).getAs[String]("uid") == "Keepin Hi")
    assert(rows(0).getAs[String]("gid") == null)
    assert(rows(0).getAs[java.sql.Timestamp]("time") == tsOf("2019-09-06T00:00:00Z"))
    assert(rows(1).getAs[String]("uid") == "Keepin HiHi")
    assert(rows(2).getAs[String]("uid") == "Keepin Med")
    assert(vmap(rows(2)).isEmpty)
    assert(rows(0).getAs[String]("geom").startsWith("POLYGON"))
  }

  test("geography: JTS-computed goldens over the envelopes fixture (m4 geom cross-check)") {
    // m4_geography's geom column has no DuckDB-spatial oracle offline; this
    // pins the WKT output through an independent JTS read-back instead:
    // per-row polygon areas/point-counts and the 4-envelope union's
    // area/centroid. The envelopes are concentric (union area == largest
    // row's area) — a semantic cross-check, not just a string compare.
    val rows = run(new GenericGeography("topic"), "driftworker-envelopes.json")
    val rdr = new org.locationtech.jts.io.WKTReader()
    val geoms = rows.map(r => rdr.read(r.getAs[String]("geom")))
    assert(geoms.map(_.getNumPoints).toSeq == Seq(17, 23, 21, 16))
    val wantAreas = Seq(0.0020895, 0.004088, 0.005121, 0.0059395)
    geoms.map(_.getArea).zip(wantAreas).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-9, s"area $got != $want")
    }
    val union = geoms.reduce(_.union(_))
    assert(math.abs(union.getArea - 0.0059395) < 1e-9, s"union area ${union.getArea}")
    assert(math.abs(union.getCentroid.getX - 242.47193287874956) < 1e-9)
    assert(math.abs(union.getCentroid.getY - 32.374193366444985) < 1e-9)
    // concentric: the union collapses to the largest envelope's ring count
    assert(union.getNumPoints == 16)
  }

  test("geography: antimeridian (0-360 lon) adversarial fixture — as-is coords, WKB round-trip, planar union") {
    // The reference stores coordinates AS-IS (`tables.py:26-27`) — no
    // longitude normalization — and its only geometry fixture sits at lon
    // 242.x, far from the seam. This message carries TWO overlapping
    // polygon features straddling lon 180 in the 0–360 convention; in
    // as-is planar math they genuinely overlap, so the unary union must
    // yield ONE polygon with un-wrapped >180 longitudes — any engine that
    // normalized to ±180 would split, wrap, or reflect it.
    def ring(c: ((Int, Int))*) = c.map { case (x, y) => s"[$x,$y]" }.mkString("[", ",", "]")
    def feat(r: String) =
      s"""{"type":"Feature","properties":{},"geometry":{"type":"Polygon","coordinates":[$r]}}"""
    val a = feat(ring((175, 10), (183, 10), (183, 20), (175, 20), (175, 10)))
    val b = feat(ring((177, 10), (185, 10), (185, 20), (177, 20), (177, 10)))
    val msg = s"""{"uid":"seam","gid":"AM","time":"2020-01-01T00:00:00Z",""" +
      s""""values":{"method":"adversarial"},"geojson":{"type":"FeatureCollection","features":[$a,$b]}}"""
    val spark0 = spark; import spark0.implicits._
    val rows = new GenericGeography("topic")
      .transform(Seq(("k", msg)).toDF("key", "value")).collect()
    assert(rows.length == 1)
    val wkt = rows(0).getAs[String]("geom")
    assert(wkt.startsWith("POLYGON"), s"union across the seam must stay one polygon: $wkt")
    val g = new org.locationtech.jts.io.WKTReader().read(wkt)
    // As-is coordinates: the envelope spans 175..185 — nothing wrapped
    // negative, nothing reflected to the ±180 convention.
    val env = g.getEnvelopeInternal
    assert(env.getMinX == 175.0 && env.getMaxX == 185.0, env.toString)
    assert(g.getArea > 99.999999 && g.getArea < 100.000001, s"planar union area ${g.getArea}")
    assert(math.abs(g.getCentroid.getX - 180.0) < 1e-9, "centroid sits ON the seam")
    assert(math.abs(g.getCentroid.getY - 15.0) < 1e-9)
    // WKB round-trip: the wire form a PostGIS geometry column would carry
    // must reproduce the geometry exactly, seam coordinates included.
    val wkb = new org.locationtech.jts.io.WKBWriter()
    val back = new org.locationtech.jts.io.WKBReader().read(wkb.write(g))
    assert(back.equalsExact(g), "WKB round-trip must be exact")
    // And the fixture-golden union from the envelopes test round-trips too.
    val envRows = run(new GenericGeography("topic"), "driftworker-envelopes.json")
    val rdr = new org.locationtech.jts.io.WKTReader()
    envRows.map(r => rdr.read(r.getAs[String]("geom"))).foreach { ge =>
      assert(new org.locationtech.jts.io.WKBReader().read(wkb.write(ge)).equalsExact(ge))
    }
  }

  test("sofar: NwicFloatReportsSofar goldens") {
    val rows = run(new NwicFloatReportsSofar("sofar.data"), "sofar.json")
    assert(rows.length == 146)
    val m = rows.head
    assert(m.getAs[String]("uid") == "0199")
    assert(m.getAs[java.sql.Timestamp]("time") == tsOf("2019-04-01T06:33:31Z"))
    assert(m.getAs[Double]("lat") == 2.66157)
    assert(m.getAs[Double]("lon") == -149.43383)
    val v = vmap(m)
    assert(v("significantWaveHeight") == "2.19")
    assert(v("peakPeriod") == "9.3")
    assert(v("meanPeriod") == "7.76")
    assert(v("peakDirection") == "85.2")
    assert(v("peakDirectionalSpread") == "38.29")
    assert(v("meanDirection") == "72.57")
    assert(v("meanDirectionalSpread") == "58.01")
    val payload = PyJson.parse(m.getAs[String]("payload"))
    assert(!payload.has("message"))
    assert(payload.get("spotterId").asText == "SPOT-0199")
    assert(payload.get("significantWaveHeight").asDouble == 2.19)
  }

  test("statistics: GenericFieldStatistic goldens") {
    val rows = run(new GenericFieldStatistic("topic"), "statistics.json")
    assert(rows.length == 4)
    val r0 = rows(0)
    assert(r0.getAs[String]("source") == "gom-02-combined")
    assert(r0.getAs[String]("period") == "monthly")
    assert(r0.getAs[java.sql.Timestamp]("starting") == tsOf("2020-01-01T00:00:00Z"))
    assert(r0.getAs[java.sql.Timestamp]("ending") == tsOf("2020-02-01T00:00:00Z"))
    val vals = PyJson.parse(r0.getAs[String]("values"))
    assert(vals.get("Analysis_1").asInt == 10)
    assert(vals.get("Field_D").asInt == 80)
    assert(rows(1).getAs[String]("period") == "daily")
    assert(rows(2).getAs[String]("period") == "instant")
  }

  test("base64_images: GenericFloat carries data-URIs through HSTORE") {
    val rows = run(new GenericFloat("topic"), "base64_images.json")
    assert(rows.length == 3)
    rows.foreach { r =>
      val img = vmap(r)("image_One")
      assert(img.startsWith("data:image/jpeg;base64,/9j/"))
    }
  }

  test("flatten goldens (test_expanded_objects.json)") {
    val msgs = FileReplay.messages(s"$fx/test_expanded_objects.json")
    val flats = msgs.map(m => Kernel.flatten(PyJson.parse(m)))
    assert(PyJson.pyStr(flats(0)("values_misc_Name")) == "pickup_detection")
    assert(flats(0)("values_misc_detection_results_correlated_movement").asBoolean == false)
    assert(flats(1)("values_misc_points").isArray)
    assert(flats(1)("values_misc_points_0_0").asDouble == 1569230478.0)
    assert(flats(1)("values_misc_points_8_2").asDouble == -90.6609)
    assert(flats(2)("data_segment_data_0").asInt == 33)
    assert(PyJson.pyStr(flats(2)("data_segment_data")) == "[33, 1, 1, 1, 0, 0, 0, 0, 0]")
  }

  test("string-json expansion goldens (h_a_s_with_gps_points.json)") {
    val rows = run(new NwicFloatReports("foo"), "h_a_s_with_gps_points.json")
    assert(rows.length == 50)
    val v0 = vmap(rows(0))
    assert(v0("values_misc_detection_results_correlated_movement") == "False")
    assert(v0("values_misc_detection_results_tilt_angle") == "False")
    assert(v0("values_misc_detection_results_velocity_and_distance") == "False")
    val v16 = vmap(rows(16))
    assert(v16("values_misc_points") ==
      "[[1569230478.0, 29.2534, -90.6609], [1569230778.0, 29.2534, -90.6609], " +
      "[1569231078.0, 29.2534, -90.6609], [1569231378.0, 29.2534, -90.6609], " +
      "[1569231678.0, 29.2534, -90.6609], [1569231978.0, 29.2534, -90.6609], " +
      "[1569232278.0, 29.2534, -90.6609], [1569232578.0, 29.2534, -90.6609], " +
      "[1569232878.0, 29.2534, -90.6609]]")
    assert(v16("values_misc_points_0") == "[1569230478.0, 29.2534, -90.6609]")
    assert(v16("values_misc_points_0_0") == "1569230478.0")
    assert(v16("values_misc_points_0_1") == "29.2534")
    assert(v16("values_misc_points_0_2") == "-90.6609")
    assert(v16("values_misc_points_8") == "[1569232878.0, 29.2534, -90.6609]")
    assert(v16("values_misc_points_8_0") == "1569232878.0")
  }

  test("arete_data: payload equals CPython json.dumps after key-pop (ground-truth hash)") {
    // Ground truth = CPython 3.11 `json.dumps(el, separators=(',',':'),
    // ensure_ascii=False)` of every fixture element with json.not_decoded /
    // json.Compressed_Data popped, sorted and newline-joined, pinned as a
    // SHA-256 (computed 2026-08-12 against the live interpreter). Pins the
    // payload column's float rendering (repr, e-07-style) and the
    // order-preserving key removal of T2 (`tables.py:379-463`) without
    // committing the fixture-derived text itself.
    val rows = run(new AreteData("topic"), "arete_data.json")
    assert(rows.length == 137)
    val got = rows.map(_.getAs[String]("payload")).toVector.sorted
    // Debuggable exemplar first: the sub-1e-4 doubles that motivated the
    // CPython float writer, byte-for-byte.
    val ex = got.find(_.contains("\"lat0\":")).getOrElse(fail("no payload with lat0"))
    val slice = ex.substring(ex.indexOf("\"lat0\":"))
    assert(slice.startsWith("\"lat0\":1.7881393432617188e-07,\"lat1\":-1.0132789611816406e-06," +
      "\"lat2\":-6.556510925292969e-07,\"lat3\":-5.960464477539062e-07"), slice.take(160))
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(got.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(digest == "9b093abc9dd3363a3a49fb5fc9c4a5af87cda5a3ef604d95c28e177f32a55619")
  }

  test("python repr parity (pyFloatRepr)") {
    val cases = Map(
      1569230478.0 -> "1569230478.0", 29.2534 -> "29.2534", -90.6609 -> "-90.6609",
      2.72 -> "2.72", 0.01 -> "0.01", 0.0 -> "0.0", 1e16 -> "1e+16",
      1e-5 -> "1e-05", 123.456 -> "123.456", -0.5 -> "-0.5", 100.0 -> "100.0",
      1.5e17 -> "1.5e+17", 3.14e-7 -> "3.14e-07", 7e22 -> "7e+22",
      1e15 -> "1000000000000000.0", 999999999999999.9 -> "999999999999999.9")
    cases.foreach { case (d, want) =>
      assert(PyJson.pyFloatRepr(d) == want, s"pyFloatRepr($d)")
    }
  }

  test("python repr quote switching (CPython parity)") {
    import com.fasterxml.jackson.databind.node.TextNode
    // repr("it's") -> "it's" (double quotes, no escape);
    // repr(both quotes) -> single quotes, escaped apostrophe.
    assert(PyJson.pyRepr(new TextNode("it's")) == "\"it's\"")
    assert(PyJson.pyRepr(new TextNode("both ' and \"")) == "'both \\' and \"'")
    val arr = PyJson.parse("""["it's"]""")
    assert(PyJson.pyStr(arr) == "[\"it's\"]")
  }

  test("python literal parsing (expand_json_objects parity)") {
    assert(PyJson.expandEmbedded("{'a': False}").get.get("a").asBoolean == false)
    assert(PyJson.expandEmbedded("{'a': None, 'b': (1, 2)}").get.get("b").get(1).asInt == 2)
    assert(PyJson.expandEmbedded("33").get.asInt == 33)
    assert(PyJson.expandEmbedded("0199").isEmpty) // leading zero: stays string
    assert(PyJson.expandEmbedded("T240").isEmpty)
    assert(PyJson.expandEmbedded("2019-07-18T17:11:20.000Z").isEmpty)
    assert(PyJson.expandEmbedded("2.72").get.asDouble == 2.72)
  }
}
