package graft

import org.apache.spark.sql.SparkSession

import graft.core.{MappingRegistry, SinkConfig, TableMapping}
import graft.sinks.{DryRunSink, JdbcSink, RowSink, UpsertSink}
import graft.sources.{AvroDecoder, FileReplay, HttpSchemaRegistry, JsonDecoder,
  MessageDecoder, MsgpackDecoder}
import graft.streaming.Pipeline

/** The `dbsink` CLI (`/root/reference/dbsink/listen.py:23-190`,
  * `setup.cfg:43-44`): config resolution → mapping lookup → DDL phase →
  * consume (or `--datafile` replay). Every piece is the library surface —
  * this main only assembles them, exactly like the reference's `setup()`.
  */
object Listen {

  /** Decoder per `--packing` (`utils.py:17-51`); avro REQUIRES a registry
    * (`utils.py:36-41`) and reads the `{topic}-value` subject as the reader
    * schema (`listen.py:25,33`). */
  def decoderFor(cfg: SinkConfig): MessageDecoder = cfg.packing match {
    case "json"    => JsonDecoder
    case "msgpack" => MsgpackDecoder
    case "avro" =>
      require(cfg.registry.nonEmpty, "avro packing requires --registry")
      new AvroDecoder(new HttpSchemaRegistry(cfg.registry), Some(s"${cfg.topic}-value"))
  }

  /** DDL phase statements in the reference's order (`listen.py:103-135`):
    * schema + hstore extension, optional drop (or truncate when not
    * dropping), then create-or-migrate + indexes. `existing` is what
    * reflection found (None ⇒ CREATE path; Some ⇒ ALTER-extend, the
    * reference's `extend_existing=True`). Truncating an ABSENT table is
    * skipped outright — the reference survives that case only via its
    * try/except around the truncate (`listen.py:112-119`), and executeDdl
    * has no per-statement tolerance. */
  def ddlFor(mapping: TableMapping[_ <: Product], cfg: SinkConfig,
      existing: Option[graft.sinks.TableState] = None): Seq[String] = {
    val dropOrTruncate =
      if (cfg.drop) Seq(UpsertSink.dropDdl(mapping, cfg.schemaName))
      else if (cfg.truncate && existing.isDefined)
        Seq(UpsertSink.truncateDdl(mapping, cfg.schemaName))
      else Nil
    UpsertSink.preambleDdl(cfg.schemaName) ++ dropOrTruncate ++
      UpsertSink.createOrMigrateDdl(mapping, existing, cfg.schemaName)
  }

  /** Replay packs each file element with the configured packing and hands
    * it back through the decoder — the reference's `on_recieve(None,
    * pack(m))` round-trip (`listen.py:173-177`), which exercises the real
    * decode path from the CLI. json is the identity (FileReplay already
    * re-serializes each element); avro is rejected up front — packing a
    * bare JSON tree needs a writer schema the replay file does not carry. */
  def repackReplay(cfg: SinkConfig, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    cfg.packing match {
      case "json" => df
      case "msgpack" =>
        val spark = df.sparkSession
        import spark.implicits._
        df.select("key", "value", "__offset").as[(String, String, Long)]
          .flatMap { case (k, v, o) =>
            MsgpackDecoder.decode(MsgpackDecoder.encode(graft.functions.PyJson.parse(v)))
              .map(j => (k, j, o))
          }.toDF("key", "value", "__offset")
      case "avro" => throw new IllegalArgumentException(
        "avro --datafile replay needs a writer schema; use json or msgpack")
    }

  def mappingFor(cfg: SinkConfig): TableMapping[_ <: Product] = {
    val m = MappingRegistry.lookup(cfg.lookup, cfg.topic, cfg.filters)
    if (cfg.table.nonEmpty)
      TableMapping.withTable(m.asInstanceOf[TableMapping[Product]], cfg.table)
    else m
  }

  /** The assembled dataflow; returns the sink for inspection (tests mirror
    * the reference's `--datafile --no-listen --no-do-inserts` suite). */
  def run(cfg: SinkConfig, spark: SparkSession): RowSink = {
    graft.core.Log.init(cfg.logfile)
    val mapping = mappingFor(cfg)
    graft.core.Log.info(
      s"mapping ${cfg.lookup} (topic ${cfg.topic}) -> table ${cfg.schemaName}.${mapping.table}")
    val sink: RowSink =
      if (cfg.doInserts) new JdbcSink(cfg.db, new java.util.Properties)
      else new DryRunSink

    // Reflect-before-DDL: after --drop the table is gone, so the CREATE
    // path applies regardless of what reflection would have found.
    if (cfg.doInserts) {
      val existing =
        if (cfg.drop) None else sink.describeTable(cfg.schemaName, mapping.table)
      val ddl = ddlFor(mapping, cfg, existing)
      graft.core.Log.info(
        s"DDL phase (${if (existing.isDefined) "migrate" else "create"}): ${ddl.size} statements")
      sink.executeDdl(ddl)
    }

    if (cfg.datafile.nonEmpty) {
      // Replay mode (`listen.py:173-177`): same transform + sink path as
      // the stream, batch source — including the explicit __offset so
      // last-wins dedup picks the file-order winner like the reference's
      // sequential apply (not a planner-placement accident).
      graft.core.Log.info(s"replaying ${cfg.datafile} (packing ${cfg.packing})")
      UpsertSink.writeBatch(
        mapping.transformWithOffset(
          repackReplay(cfg, FileReplay.read(spark, cfg.datafile))), mapping, sink)
      graft.core.Log.info(s"replay of ${cfg.datafile} complete")
    } else if (cfg.listen) {
      val stream = Pipeline.kafkaSource(spark, cfg.brokers, cfg.topic,
        cfg.offset, Option(cfg.consumer).filter(_.nonEmpty))
      // Durable checkpoint keyed by table AND topic (a stale checkpoint
      // reused for a different source would replay wrong offsets), rooted
      // under the user home so durability does not depend on the launch
      // directory; a continuous trigger so listen mode consumes forever
      // like the reference's loop — AvailableNow would drain once and exit.
      val ckpt =
        if (cfg.checkpoint.nonEmpty) cfg.checkpoint
        else s"${sys.props("user.home")}/.graft/checkpoints/" +
          s"${mapping.table}-${cfg.topic.replaceAll("[^A-Za-z0-9._-]", "_")}"
      graft.core.Log.info(s"listening on ${cfg.topic} (checkpoint $ckpt)")
      val query = Pipeline.run(stream, mapping, sink,
        checkpoint = ckpt,
        decoder = decoderFor(cfg),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      query.awaitTermination()
    }
    sink
  }

  def main(args: Array[String]): Unit = {
    if (args.contains("--help")) { println(SinkConfig.usage); return }
    val cfg = SinkConfig.fromArgs(args.toSeq)
    val spark = SparkSession.builder()
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .appName("graft-listen")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    if (cfg.verbose == 0) spark.sparkContext.setLogLevel("WARN")
    val sink = run(cfg, spark)
    sink match {
      case d: DryRunSink => println(s"[graft.listen] dry-run rows: ${d.rowsSeen}")
      case _ => ()
    }
  }
}
