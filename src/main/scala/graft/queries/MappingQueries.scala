package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.TableMapping
import graft.sources.FileReplay
import graft.tables._

/** The faithful layer (SURVEY.md §2.5) surfaced through the driver contract:
  * each mapping replayed over its reference fixture (read in place from the
  * read-only reference checkout — the same files its own tests use). These
  * have no SQL oracle (the semantics are per-message Python dataflow, pinned
  * instead by MappingFixtureSpec's goldens), so the driver records rows-only
  * checks. The row counts match the reference's pytest assertions.
  */
object MappingQueries {

  private val fx = "/root/reference/tests"

  private def replay(mapping: TableMapping[_ <: Product], file: String)(
      s: SparkSession, d: String): DataFrame =
    mapping.transform(FileReplay.read(s, s"$fx/$file"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_jsonmap" -> replay(new JsonMap("topic"), "mission_sensors.json") _,
    "m2_stringmap" -> replay(new StringMap("topic"), "mission_sensors.json") _,
    "m3_field_statistic" -> replay(new GenericFieldStatistic("topic"), "statistics.json") _,
    "m4_geography" -> replay(new GenericGeography("topic"), "scuttle-watch-regions.json") _,
    "m5_generic_float" -> replay(new GenericFloat("axds-netcdf-replayer-data"), "replayer.json") _,
    "m6_arete_data" -> replay(new AreteData("topic"), "arete_data.json") _,
    "m7_numurus_data" -> replay(new NumurusData("topic"), "numurus.data.json") _,
    "m8_numurus_status" -> replay(new NumurusStatus("topic"), "numurus.status.json") _,
    "m9_nwic_reports" -> replay(new NwicFloatReports("foo"), "health_and_status.json") _,
    "m10_sofar" -> replay(new NwicFloatReportsSofar("sofar.data"), "sofar.json") _,
    // Map-typed column functions over an HSTORE values column (rows-only:
    // the oracle runs on the source tables, not on mapping output).
    "m11_map_funcs" -> { (s, d) =>
      import org.apache.spark.sql.functions._
      new NwicFloatReports("foo").transform(
          graft.sources.FileReplay.read(s, s"$fx/health_and_status.json"))
        .select(col("uid"),
          size(col("values")).as("n_values"),
          array_sort(map_keys(col("values"))).as("keys"),
          element_at(col("values"), "mfr").as("mfr"),
          map_concat(col("values"), map(lit("engine"), lit("graft"))).getItem("engine").as("engine"))
        .orderBy(col("uid"), col("n_values"))
    }
  )
}
