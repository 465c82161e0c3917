package graft

import graft.core.{SinkConfig, TableMapping}
import graft.sinks.DryRunSink

/** CLI tier (reference `tests/test_dbsink.py:15-34` smoke + replay): config
  * resolution, env/flag precedence, DDL phase ordering, and the
  * `--datafile --no-listen --no-do-inserts` end-to-end replay. */
class CliSpec extends SparkTestBase {

  test("--help prints usage without starting anything") {
    Listen.main(Array("--help")) // must not throw (nor require a session)
    assert(SinkConfig.usage.contains("--datafile"))
  }

  test("config precedence: defaults < env < flags; filters parse as UTC") {
    val env = Map("DBSINK_LOOKUP" -> "GenericFloat", "DBSINK_DROP" -> "true",
      "DBSINK_TOPIC" -> "env.topic")
    val c0 = SinkConfig.fromArgs(Nil, env)
    assert(c0.lookup == "GenericFloat" && c0.drop && c0.topic == "env.topic")
    val c1 = SinkConfig.fromArgs(
      Seq("--lookup", "JsonMap", "--no-drop", "-vv",
        "--start_date", "2020-01-01T00:00:00"), env)
    assert(c1.lookup == "JsonMap" && !c1.drop && c1.verbose == 2)
    assert(c1.topic == "env.topic") // env survives where no flag given
    assert(c1.filters.startUs.contains(
      graft.functions.Kernel.parseTimeUtc("2020-01-01T00:00:00Z")))
    intercept[IllegalArgumentException](SinkConfig.fromArgs(Seq("--bogus")))
    intercept[IllegalArgumentException](SinkConfig.fromArgs(Seq("--packing", "xml")))
  }

  test("table defaults to topic; --table override renames table and constraint") {
    val m0 = Listen.mappingFor(SinkConfig(topic = "oot.floats", lookup = "GenericFloat"))
    assert(m0.table == "oot-floats")
    val m1 = Listen.mappingFor(
      SinkConfig(topic = "oot.floats", lookup = "GenericFloat", table = "my.floats"))
    assert(m1.table == "my-floats")
    assert(m1.upsertConstraintName.contains("my_floats_unique_constraint"))
    assert(m1.upsertKeys == m0.upsertKeys)
    // append-only mappings stay constraint-less under the override
    val m2 = Listen.mappingFor(SinkConfig(topic = "t", lookup = "JsonMap", table = "x"))
    assert(m2.upsertConstraintName.isEmpty)
  }

  test("DDL phase order: schema, extension, drop-or-truncate, create, index") {
    val cfg = SinkConfig(topic = "t", lookup = "GenericFloat", drop = true)
    val ddl = Listen.ddlFor(Listen.mappingFor(cfg), cfg)
    val kinds = ddl.map(_.split(" ").take(2).mkString(" "))
    assert(kinds.take(3) == Seq("CREATE SCHEMA", "CREATE EXTENSION", "DROP TABLE"))
    assert(ddl.exists(_.startsWith("CREATE TABLE")) && ddl.exists(_.startsWith("CREATE UNIQUE")))
    // truncate only when not dropping (`listen.py:108-119`) AND the table
    // exists — truncating an absent table would abort the DDL phase (the
    // reference survives it only via try/except).
    val cfg2 = cfg.copy(drop = false, truncate = true)
    val exists = Some(graft.sinks.TableState(Set("id"), Set.empty, Set.empty))
    assert(Listen.ddlFor(Listen.mappingFor(cfg2), cfg2, exists).exists(_.startsWith("TRUNCATE")))
    assert(!Listen.ddlFor(Listen.mappingFor(cfg2), cfg2, None).exists(_.startsWith("TRUNCATE")))
    val cfg3 = cfg.copy(truncate = true)
    assert(!Listen.ddlFor(Listen.mappingFor(cfg3), cfg3, exists).exists(_.startsWith("TRUNCATE")))
  }

  test("replay mode end-to-end: --datafile --no-listen --no-do-inserts") {
    val sink = Listen.run(SinkConfig(
      topic = "axds-netcdf-replayer-data", lookup = "GenericFloat",
      datafile = "/root/reference/tests/replayer.json",
      listen = false, doInserts = false), spark)
    assert(sink.asInstanceOf[DryRunSink].rowsSeen == 4)
    // dry-run executes no DDL (reference: DDL phase only under --do-inserts)
    assert(sink.asInstanceOf[DryRunSink].ddlSeen.isEmpty)
  }

  test("uppercase --table parity (reference test_numurus_data_geography_uppercase)") {
    // Table case is preserved; derived constraint/index names are
    // lowercased with '-' → '_' (`maps.py:25,28-38`).
    val cfg = SinkConfig(topic = "numurus-data-test", lookup = "NumurusData",
      table = "Numurus-Data-Uppercase", truncate = true,
      datafile = "/root/reference/tests/numurus.data.json",
      listen = false, doInserts = false)
    val m = Listen.mappingFor(cfg)
    assert(m.table == "Numurus-Data-Uppercase")
    assert(m.upsertConstraintName.contains("numurus_data_uppercase_unique_constraint"))
    assert(m.uniqueIndexName == "numurus_data_uppercase_unique_idx")
    val sink = Listen.run(cfg, spark)
    // 8 messages survive the mapping (pinned in MappingFixtureSpec) but the
    // fixture repeats natural keys: after last-wins upsert dedup the table
    // would hold 2 rows — which is what the sink sees.
    assert(sink.asInstanceOf[DryRunSink].rowsSeen == 2)
  }

  test("--logfile routes the tool's log lines to the file") {
    val f = java.nio.file.Files.createTempFile("graft-log", ".log")
    try {
      Listen.run(SinkConfig(
        topic = "axds-netcdf-replayer-data", lookup = "GenericFloat",
        datafile = "/root/reference/tests/replayer.json",
        logfile = f.toString, listen = false, doInserts = false), spark)
      graft.core.Log.close() // flush + release before reading
      val lines = scala.jdk.CollectionConverters
        .ListHasAsScala(java.nio.file.Files.readAllLines(f)).asScala
      assert(lines.exists(_.contains("mapping GenericFloat")), s"got: $lines")
      assert(lines.exists(_.contains("replay of /root/reference/tests/replayer.json complete")))
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("CLI main end-to-end: --packing msgpack --datafile replay (pack→decode round-trip)") {
    // Through the actual main(), like the reference's CLI integration tier:
    // each file element is msgpack-packed then decoded before mapping.
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Listen.main(Array(
        "--datafile", "/root/reference/tests/replayer.json",
        "--packing", "msgpack",
        "--lookup", "GenericFloat",
        "--topic", "axds-netcdf-replayer-data",
        "--no-listen", "--no-do-inserts"))
    }
    assert(out.toString.contains("dry-run rows: 4"), s"stdout: ${out.toString}")
    // avro replay is rejected up front (no writer schema in a JSON file)
    intercept[IllegalArgumentException] {
      Listen.run(SinkConfig(packing = "avro", registry = "http://x",
        datafile = "/root/reference/tests/replayer.json",
        listen = false, doInserts = false), spark)
    }
  }

  test("avro packing refuses to start without a registry") {
    intercept[IllegalArgumentException] {
      Listen.decoderFor(SinkConfig(packing = "avro", registry = ""))
    }
  }
}
