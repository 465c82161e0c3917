package graft.sources

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node._
import graft.functions.PyJson

/** S3/S4/S5 — pluggable message decoders (SURVEY.md §2.1). The reference
  * selects an unpack function per `--packing` (`/root/reference/dbsink/
  * utils.py:17-51`); here a decoder turns raw bytes into the engine's
  * message text (JSON), after which every mapping path is identical.
  * Decode failures return None ⇒ the message is skipped and counted, never
  * failing the job (`listen.py:138-143`).
  */
trait MessageDecoder extends Serializable {
  def decode(bytes: Array[Byte]): Option[String]
  /** The reference's `--packing` name for this decoder (`utils.py:17-51`) —
    * the label operational metrics report per batch. */
  def name: String
}

/** S3 — JSON passthrough (bytes are UTF-8 JSON text). */
object JsonDecoder extends MessageDecoder {
  val name = "json"
  def decode(bytes: Array[Byte]): Option[String] =
    try {
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      PyJson.parse(s) // validate
      Some(s)
    } catch { case _: Exception => None }
}

/** S4 — msgpack → JSON. The reference delegates to msgpack-python
  * (`utils.py:42-45`); no msgpack jar ships offline, so this is a minimal
  * decoder written to the public MessagePack spec (msgpack.org). */
object MsgpackDecoder extends MessageDecoder {
  val name = "msgpack"
  import java.nio.ByteBuffer

  def decode(bytes: Array[Byte]): Option[String] =
    try Some(PyJson.mapper.writeValueAsString(read(ByteBuffer.wrap(bytes))))
    catch { case _: Exception => None }

  def read(b: ByteBuffer): JsonNode = {
    val t = b.get() & 0xff
    t match {
      case x if x <= 0x7f => new IntNode(x) // positive fixint
      case x if x >= 0xe0 => new IntNode(x - 256) // negative fixint
      case x if (x & 0xf0) == 0x80 => readMap(b, x & 0x0f)
      case x if (x & 0xf0) == 0x90 => readArr(b, x & 0x0f)
      case x if (x & 0xe0) == 0xa0 => readStr(b, x & 0x1f)
      case 0xc0 => NullNode.getInstance
      case 0xc2 => BooleanNode.FALSE
      case 0xc3 => BooleanNode.TRUE
      case 0xc4 => readBin(b, b.get() & 0xff)
      case 0xc5 => readBin(b, b.getShort() & 0xffff)
      case 0xc6 => readBin(b, b.getInt())
      case 0xca => new DoubleNode(b.getFloat().toDouble)
      case 0xcb => new DoubleNode(b.getDouble())
      case 0xcc => new IntNode(b.get() & 0xff)
      case 0xcd => new IntNode(b.getShort() & 0xffff)
      case 0xce => new LongNode(b.getInt() & 0xffffffffL)
      case 0xcf =>
        val v = b.getLong()
        if (v >= 0) new LongNode(v)
        else new BigIntegerNode(new java.math.BigInteger(java.lang.Long.toUnsignedString(v)))
      case 0xd0 => new IntNode(b.get().toInt)
      case 0xd1 => new IntNode(b.getShort().toInt)
      case 0xd2 => new IntNode(b.getInt())
      case 0xd3 => new LongNode(b.getLong())
      case 0xd9 => readStr(b, b.get() & 0xff)
      case 0xda => readStr(b, b.getShort() & 0xffff)
      case 0xdb => readStr(b, b.getInt())
      case 0xdc => readArr(b, b.getShort() & 0xffff)
      case 0xdd => readArr(b, b.getInt())
      case 0xde => readMap(b, b.getShort() & 0xffff)
      case 0xdf => readMap(b, b.getInt())
      case other => throw new IllegalArgumentException(f"msgpack type 0x$other%02x unsupported")
    }
  }

  private def readStr(b: ByteBuffer, n: Int): JsonNode = {
    val a = new Array[Byte](n); b.get(a)
    new TextNode(new String(a, java.nio.charset.StandardCharsets.UTF_8))
  }
  private def readBin(b: ByteBuffer, n: Int): JsonNode = {
    val a = new Array[Byte](n); b.get(a)
    BinaryNode.valueOf(a)
  }
  private def readArr(b: ByteBuffer, n: Int): JsonNode = {
    val out = PyJson.mapper.createArrayNode()
    (0 until n).foreach(_ => out.add(read(b)))
    out
  }
  private def readMap(b: ByteBuffer, n: Int): JsonNode = {
    val out = PyJson.mapper.createObjectNode()
    (0 until n).foreach { _ =>
      val k = read(b) match {
        case s: TextNode => s.textValue
        case other       => other.asText
      }
      out.set[JsonNode](k, read(b))
    }
    out
  }

  /** Spec-conformant encoder (tests + the pack side of the replay path —
    * the reference packs with `msgpack.packb`, `utils.py:43`). */
  def encode(n: JsonNode): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    write(n, new java.io.DataOutputStream(out))
    out.toByteArray
  }

  private def write(n: JsonNode, o: java.io.DataOutputStream): Unit = n match {
    case _: NullNode => o.write(0xc0)
    case b: BooleanNode => o.write(if (b.booleanValue) 0xc3 else 0xc2)
    case v if v.isIntegralNumber =>
      val l = v.longValue
      if (l >= 0 && l <= 0x7f) o.write(l.toInt)
      else if (l < 0 && l >= -32) o.write((l & 0xff).toInt)
      else { o.write(0xd3); o.writeLong(l) }
    case v if v.isFloatingPointNumber => o.write(0xcb); o.writeDouble(v.doubleValue)
    case s: TextNode =>
      val bs = s.textValue.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      o.write(0xdb); o.writeInt(bs.length); o.write(bs)
    case a: ArrayNode =>
      o.write(0xdd); o.writeInt(a.size)
      a.elements.forEachRemaining(e => write(e, o))
    case m: ObjectNode =>
      o.write(0xdf); o.writeInt(m.size)
      m.fields.forEachRemaining { e =>
        write(new TextNode(e.getKey), o); write(e.getValue, o)
      }
    case other => throw new IllegalArgumentException(s"cannot pack $other")
  }
}

/** S5 — Avro with a schema-registry lookup (`utils.py:33-41`: the reference
  * refuses avro without a registry). The registry client is pluggable: an
  * HTTP implementation for real deployments (Confluent wire format: magic
  * byte 0 + 4-byte schema id + payload) and an in-memory one for tests. */
trait SchemaRegistry extends Serializable {
  def schemaById(id: Int): String

  /** Latest schema registered under a subject — the lookup the reference's
    * consumer actually configures: it subscribes the `{topic}-value` subject
    * (`listen.py:25,33`, `utils.py:36-41`). */
  def latestBySubject(subject: String): String
}

class InMemoryRegistry(schemas: Map[Int, String],
    subjects: Map[String, String] = Map.empty) extends SchemaRegistry {
  def schemaById(id: Int): String = schemas(id)
  def latestBySubject(subject: String): String = subjects(subject)
}

/** Confluent-compatible HTTP registry client: `/schemas/ids/{id}` and
  * `/subjects/{subject}/versions/latest`. */
class HttpSchemaRegistry(baseUrl: String) extends SchemaRegistry {
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def fetch(path: String): String =
    cache.computeIfAbsent(path, { p =>
      val url = new java.net.URI(s"$baseUrl$p").toURL
      val body = scala.io.Source.fromInputStream(url.openStream(), "UTF-8").mkString
      PyJson.parse(body).get("schema").asText
    })
  def schemaById(id: Int): String = fetch(s"/schemas/ids/$id")
  def latestBySubject(subject: String): String =
    fetch(s"/subjects/$subject/versions/latest")
}

/** @param readerSubject when set (the consumer path: `{topic}-value`), the
  *   subject's latest schema is the Avro READER schema and each message's
  *   id-schema the WRITER — standard Avro schema-evolution resolution, so
  *   old messages decode into the current shape (defaulted fields filled,
  *   removed fields dropped). */
class AvroDecoder(registry: SchemaRegistry,
    readerSubject: Option[String] = None) extends MessageDecoder {
  val name = "avro"
  import org.apache.avro.Schema
  import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
  import org.apache.avro.io.DecoderFactory

  @transient private lazy val parsedSchemas =
    new java.util.concurrent.ConcurrentHashMap[Int, Schema]()
  @transient private lazy val readerSchema: Option[Schema] =
    readerSubject.map(s => new Schema.Parser().parse(registry.latestBySubject(s)))

  def decode(bytes: Array[Byte]): Option[String] = {
    // Failure classification: MALFORMED data (bad frame, unknown schema id
    // = registry 404, undecodable body) dead-letters the message like the
    // reference's skip-on-unpack-error; ENVIRONMENTAL failures (registry
    // unreachable, subject lookup down) propagate and fail the task — a
    // retry can succeed, and dead-lettering them would silently lose whole
    // batches of valid messages.
    val rs = readerSchema // environmental: outside any catch-all
    // frame parse: malformed ⇒ None. >= 5: a record whose fields all
    // encode to zero bytes is a valid 5-byte frame.
    if (bytes == null || bytes.length < 5 || bytes(0) != 0) return None
    val id = java.nio.ByteBuffer.wrap(bytes, 1, 4).getInt
    val writer =
      try parsedSchemas.computeIfAbsent(id,
        { id => new Schema.Parser().parse(registry.schemaById(id)) })
      catch {
        // 404 = schema id not registered ⇒ the message is bogus, not the
        // environment (FileNotFoundException is url.openStream's 404).
        case _: java.io.FileNotFoundException | _: NoSuchElementException => return None
      }
    try {
      val reader = rs match {
        case Some(r) => new GenericDatumReader[Any](writer, r)
        case None    => new GenericDatumReader[Any](writer)
      }
      val dec = DecoderFactory.get().binaryDecoder(bytes, 5, bytes.length - 5, null)
      val record = reader.read(null, dec)
      Some(avroToJson(record).toString)
    } catch { case _: Exception => None }
  }

  private def avroToJson(v: Any): JsonNode = v match {
    case null => NullNode.getInstance
    case r: GenericRecord =>
      val o = PyJson.mapper.createObjectNode()
      r.getSchema.getFields.forEach(f => o.set[JsonNode](f.name, avroToJson(r.get(f.name))))
      o
    case m: java.util.Map[_, _] =>
      val o = PyJson.mapper.createObjectNode()
      m.forEach((k, vv) => o.set[JsonNode](k.toString, avroToJson(vv)))
      o
    case l: java.util.Collection[_] =>
      val a = PyJson.mapper.createArrayNode()
      l.forEach(e => a.add(avroToJson(e)))
      a
    case s: org.apache.avro.util.Utf8 => new TextNode(s.toString)
    case s: String => new TextNode(s)
    case i: java.lang.Integer => new IntNode(i)
    case l: java.lang.Long => new LongNode(l)
    case f: java.lang.Float => new DoubleNode(f.toDouble)
    case d: java.lang.Double => new DoubleNode(d)
    case b: java.lang.Boolean => if (b) BooleanNode.TRUE else BooleanNode.FALSE
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      BinaryNode.valueOf(a)
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => new TextNode(e.toString)
    case other => new TextNode(other.toString)
  }
}
