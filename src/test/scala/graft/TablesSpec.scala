package graft

import org.apache.spark.sql.types._

/** Canary against the REAL driver testdata (not spec-synthesized parquet):
  * the driver regenerates `/root/testdata` between rounds and has already
  * shipped `events.ts` in two different parquet vintages (TIMESTAMP(NANOS)
  * → long-via-nanosAsLong, then plain TIMESTAMP(MICROS) → TIMESTAMP_NTZ) and
  * flipped column nullability. Round 8 lost all 27 e-series queries plus
  * sc8_from_json to such a flip because every spec read spec-written parquet
  * instead of the driver's. This suite pins the loader contract on the
  * actual files so `sbt test` fails the moment a regen breaks an assumption.
  */
class TablesSpec extends SparkTestBase {

  test("every Tables loader reads the driver testdata and yields rows") {
    val loaders: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "region" -> (() => Tables.region(spark, sf)),
      "nation" -> (() => Tables.nation(spark, sf)),
      "customer" -> (() => Tables.customer(spark, sf)),
      "supplier" -> (() => Tables.supplier(spark, sf)),
      "part" -> (() => Tables.part(spark, sf)),
      "orders" -> (() => Tables.orders(spark, sf)),
      "lineitem" -> (() => Tables.lineitem(spark, sf)),
      "events" -> (() => Tables.events(spark, sf)),
      "documents" -> (() => Tables.documents(spark, sf)),
      "embeddings" -> (() => Tables.embeddings(spark, sf))
    )
    loaders.foreach { case (name, load) =>
      assert(load().limit(1).count() == 1, s"$name must read and be non-empty")
    }
  }

  test("events.ts normalizes to TimestampType whatever the parquet vintage") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"ts must be TIMESTAMP (got ${ev.schema("ts").dataType}); " +
        "unix_micros()/window() reject TIMESTAMP_NTZ and longs")
    // And it must be time-function-usable end to end, not just typed right.
    val n = ev.selectExpr("unix_micros(ts)").filter("unix_micros(ts) > 0").count()
    assert(n > 0, "unix_micros over ts must evaluate")
    // Magnitude canary: the LongType branch of the loader assumes a bare
    // BIGINT ts is nanoseconds. If a regen ships BIGINT micros (or millis)
    // instead, `ts div 1000` lands centuries away from the data's epoch —
    // typed-right but 1000x off. Pin the decoded range to plausible years
    // so a unit-scale drift fails here, not only at the oracle compare.
    import org.apache.spark.sql.functions.{col, min, max, year}
    val Array(yMin, yMax) = ev.agg(min(year(col("ts"))), max(year(col("ts"))))
      .collect()(0).toSeq.map(_.asInstanceOf[Int]).toArray
    assert(yMin >= 2000 && yMax <= 2100,
      s"events.ts decodes to years [$yMin,$yMax] — unit-scale drift in the loader?")
  }

  test("expected columns exist with oracle-compatible types") {
    import scala.collection.immutable.ListMap
    val want = ListMap(
      "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
        "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "lang" -> StringType, "source" -> StringType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
    )
    val got = Map(
      "events" -> Tables.events(spark, sf).schema,
      "documents" -> Tables.documents(spark, sf).schema,
      "embeddings" -> Tables.embeddings(spark, sf).schema)
    for ((t, cols) <- want; (c, dt) <- cols) {
      val f = got(t).fields.find(_.name == c)
      assert(f.isDefined, s"$t.$c missing from driver testdata")
      // Compare ignoring containsNull/nullability flips between regens.
      def norm(d: DataType): DataType = d match {
        case ArrayType(e, _) => ArrayType(norm(e))
        case o => o
      }
      assert(norm(f.get.dataType) == norm(dt),
        s"$t.$c type drifted: ${f.get.dataType} (queries/oracles assume $dt)")
    }
  }
}
