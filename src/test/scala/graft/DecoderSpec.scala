package graft

import graft.functions.PyJson
import graft.sources._

class DecoderSpec extends SparkTestBase {

  test("msgpack round-trip of a nested message") {
    val node = PyJson.parse(
      """{"uid":"x1","n":42,"neg":-7,"big":1234567890123,"f":3.5,
        |"ok":true,"none":null,"arr":[1,2,3],"nested":{"a":"b"},
        |"wide":65535,"u32":4294967295}""".stripMargin)
    val bytes = MsgpackDecoder.encode(node)
    val back = PyJson.parse(MsgpackDecoder.decode(bytes).get)
    assert(back == PyJson.scrubNonFinite(node))
  }

  test("msgpack spec vectors decode correctly") {
    // Hand-built frames from the public MessagePack spec.
    def dec(bs: Int*): String =
      MsgpackDecoder.decode(bs.map(_.toByte).toArray).get
    assert(dec(0x07) == "7")                      // positive fixint
    assert(dec(0xff) == "-1")                     // negative fixint
    assert(dec(0xa3, 'a', 'b', 'c') == "\"abc\"") // fixstr
    assert(dec(0x93, 1, 2, 3) == "[1,2,3]")       // fixarray
    assert(dec(0x81, 0xa1, 'k', 0xc3) == "{\"k\":true}") // fixmap
    assert(dec(0xc0) == "null")
    assert(dec(0xcc, 0xff) == "255")              // uint8
    assert(dec(0xd0, 0x80) == "-128")             // int8
  }

  test("json decoder rejects malformed input") {
    assert(JsonDecoder.decode("not json".getBytes).isEmpty)
    assert(JsonDecoder.decode("""{"a":1}""".getBytes).nonEmpty)
  }

  test("avro decoder with in-memory registry (Confluent framing)") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.io.EncoderFactory
    // The reference's published wire schema, simplified (schema.avsc:1-38).
    val schemaJson =
      """{"type":"record","name":"FloatMsg","fields":[
        |{"name":"uid","type":"string"},
        |{"name":"lat","type":"double"},{"name":"lon","type":"double"},
        |{"name":"values","type":["null",{"type":"map","values":["null","long","double","string"]}]}]}""".stripMargin
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("uid", "u-1"); rec.put("lat", 32.5); rec.put("lon", -117.25)
    val m = new java.util.HashMap[String, Any]()
    m.put("speed", 2.5); m.put("count", 3L)
    rec.put("values", m)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0); bos.write(java.nio.ByteBuffer.allocate(4).putInt(7).array())
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[Any](schema).write(rec, enc)
    enc.flush()

    val decoder = new AvroDecoder(new InMemoryRegistry(Map(7 -> schemaJson)))
    val out = PyJson.parse(decoder.decode(bos.toByteArray).get)
    assert(out.get("uid").asText == "u-1")
    assert(out.get("lat").asDouble == 32.5)
    assert(out.get("values").get("speed").asDouble == 2.5)
    assert(out.get("values").get("count").asLong == 3L)
  }

  test("avro without registry framing is rejected, not fatal") {
    val decoder = new AvroDecoder(new InMemoryRegistry(Map.empty))
    assert(decoder.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("avro failure classification: 404 dead-letters, outage fails the task") {
    // unknown schema id (InMemoryRegistry throws NoSuchElementException,
    // the 404 analogue) ⇒ malformed message ⇒ None
    val framed = Array[Byte](0, 0, 0, 0, 9, 1, 2)
    assert(new AvroDecoder(new InMemoryRegistry(Map.empty)).decode(framed).isEmpty)
    // registry OUTAGE (IOException) must propagate — a silent None here
    // would permanently drop valid messages on a transient failure
    class DownRegistry extends SchemaRegistry {
      def schemaById(id: Int): String = throw new java.io.IOException("connection refused")
      def latestBySubject(s: String): String = throw new java.io.IOException("connection refused")
    }
    intercept[java.io.IOException](new AvroDecoder(new DownRegistry).decode(framed))
    intercept[java.io.IOException](
      new AvroDecoder(new DownRegistry, readerSubject = Some("t-value")).decode(framed))
  }

  test("avro latest-by-subject reader schema resolves evolution ({topic}-value)") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.io.EncoderFactory
    // Writer schema v1: one field. Reader (subject latest) v2: adds a
    // defaulted field — old messages must decode into the NEW shape.
    val v1 = """{"type":"record","name":"M","fields":[{"name":"uid","type":"string"}]}"""
    val v2 = """{"type":"record","name":"M","fields":[
                  {"name":"uid","type":"string"},
                  {"name":"source","type":"string","default":"unknown"}]}"""
    val writerSchema = new Schema.Parser().parse(v1)
    val rec = new GenericData.Record(writerSchema)
    rec.put("uid", "u-42")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0); bos.write(java.nio.ByteBuffer.allocate(4).putInt(9).array())
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[Any](writerSchema).write(rec, enc)
    enc.flush()
    val registry = new InMemoryRegistry(Map(9 -> v1), Map("oot.floats-value" -> v2))
    val decoder = new AvroDecoder(registry, readerSubject = Some("oot.floats-value"))
    val out = PyJson.parse(decoder.decode(bos.toByteArray).get)
    assert(out.get("uid").asText == "u-42")
    assert(out.get("source").asText == "unknown", "defaulted reader field must be filled")
  }

  test("reference wire schema (schema.avsc) round-trips through AvroDecoder") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.io.EncoderFactory
    // The reference's published canonical float-stream schema, read in place.
    val schemaJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/schema.avsc")), "UTF-8")
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    rec.put("uid", "float-1"); rec.put("gid", "g1")
    rec.put("time", "2019-05-07T19:57:56Z")
    rec.put("lat", 32.7); rec.put("lon", -117.2); rec.put("z", null)
    val vals = new java.util.HashMap[String, Any]()
    vals.put("speed", 2.72); vals.put("count", 7); vals.put("note", "T240")
    rec.put("values", vals)
    rec.put("meta", "")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0); bos.write(java.nio.ByteBuffer.allocate(4).putInt(1).array())
    val enc = EncoderFactory.get().binaryEncoder(bos, null)
    new GenericDatumWriter[Any](schema).write(rec, enc)
    enc.flush()
    val decoder = new AvroDecoder(new InMemoryRegistry(Map(1 -> schemaJson)))
    val out = graft.functions.PyJson.parse(decoder.decode(bos.toByteArray).get)
    assert(out.get("uid").asText == "float-1")
    assert(out.get("lat").asDouble == 32.7)
    assert(out.get("z").isNull)
    assert(out.get("values").get("speed").asDouble == 2.72)
    // and the decoded JSON feeds GenericFloat end-to-end
    val mapping = new graft.tables.GenericFloat("avro.topic")
    val row = mapping.mapMessage("k", out.toString)
    assert(row.nonEmpty)
    assert(row.get.values("speed") == "2.72")
  }
}
