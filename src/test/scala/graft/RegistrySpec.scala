package graft

import graft.core.{MappingProvider, MappingRegistry, TableMapping, TimeFilters}
import graft.sources.FileReplay
import graft.streaming.Pipeline
import graft.tables.JsonMap

/** A plugin mapping discovered via ServiceLoader (registered in
  * src/test/resources/META-INF/services). */
class TestPluginProvider extends MappingProvider {
  def name: String = "TestPlugin"
  def create(topic: String, filters: TimeFilters): TableMapping[_ <: Product] =
    new JsonMap(topic, filters)
}

class RegistrySpec extends SparkTestBase {

  test("builtin registry resolves all ten reference mapping names") {
    val names = Seq("StringMap", "JsonMap", "GenericFieldStatistic",
      "GenericGeography", "GenericFloat", "AreteData", "NumurusData",
      "NumurusStatus", "NwicFloatReports", "NwicFloatReportsSofar")
    names.foreach { n =>
      val m = MappingRegistry.lookup(n, "some.topic")
      assert(m.table == "some-topic")
    }
    intercept[IllegalArgumentException](MappingRegistry.lookup("Nope", "t"))
  }

  test("ServiceLoader plugins join the registry") {
    val m = MappingRegistry.lookup("TestPlugin", "plug.topic")
    assert(m.table == "plug-topic")
  }

  test("table/constraint naming rules match the reference") {
    val m = MappingRegistry.lookup("GenericFloat", "oot.floats.XY")
    assert(m.table == "oot-floats-XY")
    assert(m.upsertConstraintName.contains("oot_floats_xy_unique_constraint"))
    assert(m.uniqueIndexName == "oot_floats_xy_unique_idx")
    assert(m.sequenceName == "oot_floats_xy_id_seq")
  }

  test("dead-letter accumulator counts undecodable messages") {
    val spark0 = spark
    import spark0.implicits._
    val raw = Seq("not json at all", """{"ok":1}""", "{broken")
      .toDF("value")
    val out = Pipeline.decoded(raw, graft.sources.JsonDecoder)
    assert(out.count() == 1)
    assert(Pipeline.deadLetterCounter.value == 2)
  }
}
