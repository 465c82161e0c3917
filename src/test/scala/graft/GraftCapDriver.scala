package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, PreparedStatement, ResultSet, Statement}
import java.util.concurrent.CopyOnWriteArrayList

/** In-process statement-capturing JDBC driver (`jdbc:graftcap:<db>`).
  *
  * Lets SinkSpec exercise [[graft.sinks.JdbcSink]]'s REAL write path — the
  * inherited executor-side `RowSink.write` → `upsertPartition` → pgjdbc-style
  * PreparedStatement batching — without a database: every DDL `execute`,
  * every parameter bind (with HOW it was bound: setTimestamp vs
  * setObject(OTHER) vs plain setObject), and every `executeBatch` flush is
  * recorded in a process-global registry keyed by the db name in the URL, so
  * task-side captures land where the driver-side test can read them (local
  * mode shares one JVM — same trick as PartitionProbe).
  *
  * The JDBC surface is implemented with dynamic proxies: only the methods
  * JdbcSink actually calls do anything; everything else returns the
  * primitive default. `executeQuery` yields an empty ResultSet, so
  * `describeTable` reflects "no table" → the CREATE bootstrap path.
  */
object GraftCapDriver {
  /** One recorded parameter: the value plus the bind call used. */
  final case class Bind(value: Any, via: String)

  final class Db {
    val ddl = new CopyOnWriteArrayList[String]()
    /** One entry per executeBatch flush: (prepared SQL, rows of binds). */
    val flushes = new CopyOnWriteArrayList[(String, Vector[Vector[Bind]])]()
    val commits = new java.util.concurrent.atomic.AtomicInteger()
  }

  private val dbs = new java.util.concurrent.ConcurrentHashMap[String, Db]()
  def db(name: String): Db = dbs.computeIfAbsent(name, _ => new Db)
  def reset(name: String): Db = { dbs.remove(name); db(name) }

  private lazy val registered: Unit = DriverManager.registerDriver(new GraftCapDriver)
  def ensureRegistered(): Unit = registered

  private def dflt(m: Method): AnyRef = m.getReturnType match {
    case java.lang.Boolean.TYPE   => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE   => Integer.valueOf(0)
    case java.lang.Long.TYPE      => java.lang.Long.valueOf(0L)
    case java.lang.Short.TYPE     => java.lang.Short.valueOf(0.toShort)
    case java.lang.Byte.TYPE      => java.lang.Byte.valueOf(0.toByte)
    case java.lang.Double.TYPE    => java.lang.Double.valueOf(0.0)
    case java.lang.Float.TYPE     => java.lang.Float.valueOf(0.0f)
    case _                        => null
  }

  private def proxy[T](cls: Class[T])(pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls), new InvocationHandler {
      def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef = {
        val a = if (args == null) Array.empty[AnyRef] else args
        m.getName match {
          case "hashCode" => Integer.valueOf(System.identityHashCode(p))
          case "equals"   => java.lang.Boolean.valueOf(p eq a(0))
          case "toString" => s"graftcap-proxy[${cls.getSimpleName}]"
          case n if pf.isDefinedAt((n, a)) => pf((n, a))
          case _ => dflt(m)
        }
      }
    }).asInstanceOf[T]

  private def emptyResultSet(): ResultSet = proxy(classOf[ResultSet]) {
    case ("next", _) => java.lang.Boolean.FALSE
  }

  private[graft] def newConnection(d: Db): Connection = proxy(classOf[Connection]) {
    case ("createStatement", _) =>
      proxy(classOf[Statement]) {
        case ("execute", args) => d.ddl.add(args(0).asInstanceOf[String]); java.lang.Boolean.FALSE
      }
    case ("prepareStatement", args) =>
      newPrepared(d, args(0).asInstanceOf[String])
    case ("commit", _) => d.commits.incrementAndGet(); null
  }

  private def newPrepared(d: Db, sql: String): PreparedStatement = {
    val current = scala.collection.mutable.TreeMap.empty[Int, Bind]
    val pending = scala.collection.mutable.ArrayBuffer.empty[Vector[Bind]]
    def setAt(args: Array[AnyRef], via: String): AnyRef = {
      current.synchronized { current(args(0).asInstanceOf[Integer].intValue) = Bind(args(1), via) }
      null
    }
    proxy(classOf[PreparedStatement]) {
      case ("setObject", args) if args.length == 2 => setAt(args, "setObject")
      case ("setObject", args) if args.length >= 3 =>
        val t = args(2).asInstanceOf[Integer].intValue
        setAt(args, if (t == java.sql.Types.OTHER) "setObject+OTHER" else s"setObject+$t")
      case ("setTimestamp", args) => setAt(args, "setTimestamp")
      case ("setString", args)    => setAt(args, "setString")
      case ("addBatch", _) =>
        current.synchronized { pending += current.values.toVector; current.clear() }
        null
      case ("executeBatch", _) =>
        val rows = current.synchronized { val r = pending.toVector; pending.clear(); r }
        d.flushes.add(sql -> rows)
        Array.fill(rows.size)(1)
      case ("executeQuery", _) => emptyResultSet()
    }
  }
}

/** The java.sql.Driver face: DriverManager dispatches any
  * `jdbc:graftcap:<db>` URL here — including from Spark task threads, which
  * share this JVM (and this class's registry) in local mode. */
class GraftCapDriver extends Driver {
  private val prefix = "jdbc:graftcap:"
  def acceptsURL(url: String): Boolean = url != null && url.startsWith(prefix)
  def connect(url: String, info: java.util.Properties): Connection =
    if (!acceptsURL(url)) null
    else GraftCapDriver.newConnection(GraftCapDriver.db(url.stripPrefix(prefix)))
  def getMajorVersion: Int = 1
  def getMinorVersion: Int = 0
  def jdbcCompliant(): Boolean = false
  def getPropertyInfo(url: String, info: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}
