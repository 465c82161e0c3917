package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TableMapping
import graft.sources.FileReplay
import graft.tables._

/** The faithful layer (SURVEY.md §2.5) surfaced through the driver contract:
  * each mapping replayed over its reference fixture (read in place from the
  * read-only reference checkout — the same files its own tests use).
  *
  * Driver-contract hygiene (round-2): every output column is scalar and
  * deterministic — `values` HSTORE maps are rendered as sorted-key JSON
  * text, wall-clock columns (`sinked` in m1/m2, `reftime` in m10) are
  * projected out, and m11's array column is joined to text. Where DuckDB can
  * reproduce the mapping semantics over `read_json` of the fixture (m3's
  * interval statistics, m5's scalar row core) a full hash oracle is
  * declared; the rest are rows-only here and value-pinned by
  * MappingFixtureSpec's goldens.
  */
object MappingQueries {

  private val fx = "/root/reference/tests"

  /** Deterministic JSON text of a string→string map: entries sorted by key,
    * null values preserved as JSON null. */
  private def mapJson(c: Column): Column =
    to_json(map_from_entries(array_sort(map_entries(c))))

  private def replay(mapping: TableMapping[_ <: Product], file: String)(
      s: SparkSession, d: String): DataFrame =
    mapping.transform(FileReplay.read(s, s"$fx/$file"))

  /** FloatRow-shaped output with the HSTORE rendered hashable. */
  private def floatProj(df: DataFrame): DataFrame =
    df.select(col("uid"), col("gid"), col("time"), col("reftime"),
      col("lat"), col("lon"), col("z"), col("geom"),
      mapJson(col("values")).as("values_json"), col("payload"))
      .orderBy(col("uid"), col("time"), col("values_json"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // m1/m2: the `sinked` wall-clock column is faithful to the reference's
    // datetime.utcnow() but nondeterministic by construction — projected out
    // of the driver entry (pinned instead in MappingFixtureSpec).
    "m1_jsonmap" -> { (s, d) =>
      replay(new JsonMap("topic"), "mission_sensors.json")(s, d)
        .select(col("key"), col("payload")).orderBy(col("payload"))
    },
    "m2_stringmap" -> { (s, d) =>
      replay(new StringMap("topic"), "mission_sensors.json")(s, d)
        .select(col("key"), col("payload")).orderBy(col("payload"))
    },
    "m3_field_statistic" -> { (s, d) =>
      replay(new GenericFieldStatistic("topic"), "statistics.json")(s, d)
        .orderBy(col("source"), col("period"), col("starting"), col("ending"))
    },
    "m4_geography" -> { (s, d) =>
      replay(new GenericGeography("topic"), "scuttle-watch-regions.json")(s, d)
        .select(col("uid"), col("gid"), col("time"), col("reftime"),
          mapJson(col("values")).as("values_json"), col("payload"), col("geom"))
        .orderBy(col("uid"), col("time"), col("payload"))
    },
    // m5: scalar row core only (values/payload fidelity is golden-tested);
    // every column here is reproducible in DuckDB SQL → full hash oracle.
    "m5_generic_float" -> { (s, d) =>
      replay(new GenericFloat("axds-netcdf-replayer-data"), "replayer.json")(s, d)
        .select(col("uid"), col("gid"), col("time"), col("reftime"),
          col("lat"), col("lon"), col("z"), col("geom"),
          size(map_keys(col("values"))).cast("bigint").as("n_values"),
          element_at(col("values"), "location_quality").as("location_quality"))
        .orderBy(col("uid"), col("time"))
    },
    "m6_arete_data" -> { (s, d) =>
      floatProj(replay(new AreteData("topic"), "arete_data.json")(s, d))
    },
    "m7_numurus_data" -> { (s, d) =>
      floatProj(replay(new NumurusData("topic"), "numurus.data.json")(s, d))
    },
    "m8_numurus_status" -> { (s, d) =>
      floatProj(replay(new NumurusStatus("topic"), "numurus.status.json")(s, d))
    },
    "m9_nwic_reports" -> { (s, d) =>
      floatProj(replay(new NwicFloatReports("foo"), "health_and_status.json")(s, d))
    },
    // m10: `reftime` is now() in the reference (`tables.py:687`) — dropped.
    "m10_sofar" -> { (s, d) =>
      replay(new NwicFloatReportsSofar("sofar.data"), "sofar.json")(s, d)
        .select(col("uid"), col("gid"), col("time"),
          col("lat"), col("lon"), col("z"), col("geom"),
          mapJson(col("values")).as("values_json"), col("payload"))
        .orderBy(col("uid"), col("time"))
    },
    // Map-typed column functions over an HSTORE values column (rows-only:
    // the oracle runs on the source tables, not on mapping output).
    "m11_map_funcs" -> { (s, d) =>
      new NwicFloatReports("foo").transform(
          FileReplay.read(s, s"$fx/health_and_status.json"))
        .select(col("uid"),
          size(col("values")).as("n_values"),
          array_join(array_sort(map_keys(col("values"))), ",").as("keys"),
          element_at(col("values"), "mfr").as("mfr"),
          map_concat(col("values"), map(lit("engine"), lit("graft"))).getItem("engine").as("engine"))
        .orderBy(col("uid"), col("n_values"), col("keys"))
    }
  )

  def oracle: Map[String, String] = Map(
    // GenericFieldStatistic over the fixture: DuckDB reproduces the interval
    // rows exactly; `values` canonical JSON matches Jackson's compact form
    // (same key order: the fixture's records share one schema).
    "m3_field_statistic" ->
      """SELECT source, period,
        |  CAST(starting AS TIMESTAMP) AS starting,
        |  CAST(ending AS TIMESTAMP) AS ending,
        |  to_json("values") AS "values"
        |FROM read_json('/root/reference/tests/statistics.json')
        |ORDER BY source, period, starting, ending""".stripMargin,
    // GenericFloat scalar core over replayer.json: naive ISO times → UTC,
    // reftime defaults to time, POINT WKT from shortest-repr doubles, and
    // location_quality (all in-range here ⇒ '1'); n_values = original keys
    // + the injected location_quality.
    "m5_generic_float" ->
      """SELECT CAST(uid AS VARCHAR) AS uid, CAST(gid AS VARCHAR) AS gid,
        |  CAST(time AS TIMESTAMP) AS time, CAST(time AS TIMESTAMP) AS reftime,
        |  lat, lon, CAST(z AS DOUBLE) AS z,
        |  'POINT (' || CAST(lon AS VARCHAR) || ' ' || CAST(lat AS VARCHAR) || ')' AS geom,
        |  CAST(len(json_keys(to_json("values"))) + 1 AS BIGINT) AS n_values,
        |  '1' AS location_quality
        |FROM read_json('/root/reference/tests/replayer.json')
        |ORDER BY uid, time""".stripMargin
  )
}
