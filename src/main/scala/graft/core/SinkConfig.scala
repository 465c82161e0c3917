package graft.core

import graft.functions.Kernel

/** The CLI/config surface, mirroring the reference's 20 Click options with
  * env-var overrides under the `DBSINK_` prefix
  * (`/root/reference/dbsink/listen.py:23-43,189-190`). Precedence matches
  * Click's `auto_envvar_prefix`: defaults < environment < explicit flags.
  */
case class SinkConfig(
    brokers: String = "localhost:4001",
    topic: String = "axds-netcdf-replayer-data",
    table: String = "", // empty ⇒ topic (`listen.py:59-61`)
    lookup: String = "JsonMap",
    db: String = "jdbc:postgresql://localhost:30300/sink",
    schemaName: String = "public",
    consumer: String = "", // empty ⇒ random group (`utils.py:22-25`)
    offset: String = "largest",
    packing: String = "json",
    registry: String = "http://localhost:4002",
    drop: Boolean = false,
    truncate: Boolean = false,
    logfile: String = "",
    listen: Boolean = true,
    doInserts: Boolean = true,
    datafile: String = "",
    checkpoint: String = "", // empty ⇒ ~/.graft/checkpoints/<table>-<topic>
    verbose: Int = 0,
    startDate: Option[String] = None,
    endDate: Option[String] = None) {

  require(Set("json", "avro", "msgpack").contains(packing), s"unknown packing: $packing")

  def resolvedTable: String = if (table.nonEmpty) table else topic

  /** CLI dates are naive-UTC, exactly the reference's
    * `replace(tzinfo=pytz.utc)` (`listen.py:78-82`). */
  def filters: TimeFilters = TimeFilters(
    startDate.map(Kernel.parseTimeUtc), endDate.map(Kernel.parseTimeUtc))
}

object SinkConfig {
  val EnvPrefix = "DBSINK_"

  val usage: String =
    """Usage: graft.Listen [OPTIONS]
      |
      |  Consume a topic (or replay a --datafile), map each message through a
      |  named table mapping, and upsert rows into a database table whose DDL
      |  the tool creates. Every option is overridable via DBSINK_<OPTION>.
      |
      |Options:
      |  --brokers TEXT     Kafka broker string (comma separated)
      |  --topic TEXT       Kafka topic ('-value' subject is used for avro)
      |  --table TEXT       Table to sink into (default: the topic name)
      |  --lookup TEXT      Mapping name (default: JsonMap)
      |  --db TEXT          JDBC connection string
      |  --schema TEXT      Database schema (default: public)
      |  --consumer TEXT    Consumer group (default: random)
      |  --offset TEXT      Starting offset: largest|earliest|stored
      |  --packing TEXT     json|avro|msgpack (default: json)
      |  --registry TEXT    Schema Registry URL (required for avro)
      |  --drop / --no-drop             Drop the table first
      |  --truncate / --no-truncate     Truncate the table first
      |  --logfile TEXT     File to log to (default: stdout)
      |  --listen / --no-listen         Listen for messages
      |  --do-inserts / --no-do-inserts Insert into the database
      |  --datafile TEXT    JSON-array file to replay instead of listening
      |  --checkpoint TEXT  Streaming checkpoint dir (default: ~/.graft/checkpoints/<table>-<topic>)
      |  --start_date TEXT  Start date filter (UTC, ISO-8601)
      |  --end_date TEXT    End date filter (UTC, ISO-8601)
      |  -v, -vv, -vvv      Verbosity
      |  --help             Show this message and exit
      |""".stripMargin

  def fromArgs(args: Seq[String], env: Map[String, String] = sys.env): SinkConfig = {
    var c = SinkConfig()
    def e(k: String): Option[String] = env.get(EnvPrefix + k)
    // Reject unparseable boolean env values instead of silently mapping
    // them to false (DBSINK_LISTEN=tru must not disable listening); an
    // EMPTY value means unset (`DBSINK_X=` in compose files), like the
    // empty-string defaults of the text options.
    def eb(k: String): Option[Boolean] = e(k).filter(_.nonEmpty).map { v =>
      v.toLowerCase match {
        case "1" | "true" | "yes" | "on"   => true
        case "0" | "false" | "no" | "off"  => false
        case other => throw new IllegalArgumentException(
          s"$EnvPrefix$k: not a boolean: $other")
      }
    }
    e("BROKERS").foreach(v => c = c.copy(brokers = v))
    e("TOPIC").foreach(v => c = c.copy(topic = v))
    e("TABLE").foreach(v => c = c.copy(table = v))
    e("LOOKUP").foreach(v => c = c.copy(lookup = v))
    e("DB").foreach(v => c = c.copy(db = v))
    e("SCHEMA").foreach(v => c = c.copy(schemaName = v))
    e("CONSUMER").foreach(v => c = c.copy(consumer = v))
    e("OFFSET").foreach(v => c = c.copy(offset = v))
    e("PACKING").foreach(v => c = c.copy(packing = v))
    e("REGISTRY").foreach(v => c = c.copy(registry = v))
    eb("DROP").foreach(v => c = c.copy(drop = v))
    eb("TRUNCATE").foreach(v => c = c.copy(truncate = v))
    e("LOGFILE").foreach(v => c = c.copy(logfile = v))
    eb("LISTEN").foreach(v => c = c.copy(listen = v))
    eb("DO_INSERTS").foreach(v => c = c.copy(doInserts = v))
    e("DATAFILE").foreach(v => c = c.copy(datafile = v))
    e("CHECKPOINT").foreach(v => c = c.copy(checkpoint = v))
    e("START_DATE").foreach(v => c = c.copy(startDate = Some(v)))
    e("END_DATE").foreach(v => c = c.copy(endDate = Some(v)))

    var i = 0
    def next(flag: String): String = {
      i += 1
      require(i < args.length, s"missing value for $flag")
      args(i)
    }
    while (i < args.length) {
      args(i) match {
        case f @ "--brokers"   => c = c.copy(brokers = next(f))
        case f @ "--topic"     => c = c.copy(topic = next(f))
        case f @ "--table"     => c = c.copy(table = next(f))
        case f @ "--lookup"    => c = c.copy(lookup = next(f))
        case f @ "--db"        => c = c.copy(db = next(f))
        case f @ "--schema"    => c = c.copy(schemaName = next(f))
        case f @ "--consumer"  => c = c.copy(consumer = next(f))
        case f @ "--offset"    => c = c.copy(offset = next(f))
        case f @ "--packing"   => c = c.copy(packing = next(f))
        case f @ "--registry"  => c = c.copy(registry = next(f))
        case "--drop"          => c = c.copy(drop = true)
        case "--no-drop"       => c = c.copy(drop = false)
        case "--truncate"      => c = c.copy(truncate = true)
        case "--no-truncate"   => c = c.copy(truncate = false)
        case f @ "--logfile"   => c = c.copy(logfile = next(f))
        case "--listen"        => c = c.copy(listen = true)
        case "--no-listen"     => c = c.copy(listen = false)
        case "--do-inserts"    => c = c.copy(doInserts = true)
        case "--no-do-inserts" => c = c.copy(doInserts = false)
        case f @ "--datafile"  => c = c.copy(datafile = next(f))
        case f @ "--checkpoint" => c = c.copy(checkpoint = next(f))
        case f @ "--start_date" => c = c.copy(startDate = Some(next(f)))
        case f @ "--end_date"   => c = c.copy(endDate = Some(next(f)))
        case v if v.matches("-v+") => c = c.copy(verbose = c.verbose + v.length - 1)
        case other => throw new IllegalArgumentException(s"unknown option: $other")
      }
      i += 1
    }
    c
  }
}
