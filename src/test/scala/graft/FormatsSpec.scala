package graft

import org.apache.spark.sql.functions._

/** Batch source formats beyond parquet (SURVEY.md §2.4 Scans row): CSV and
  * JSON round-trips of the events table, plus the HLL++ error bound. */
class FormatsSpec extends SparkTestBase {

  test("csv scan round-trip preserves rows and values") {
    val events = Tables.events(spark, sf).select("event_id", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    events.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(events.schema).csv(dir)
    assert(back.count() == events.count())
    val a = events.agg(sum("value")).collect()(0).getDouble(0)
    val b = back.agg(sum("value")).collect()(0).getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("json scan round-trip with NaN handling") {
    val events = Tables.events(spark, sf).select("event_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    events.write.mode("overwrite").json(dir)
    val back = spark.read.schema(events.schema).json(dir)
    assert(back.count() == events.count())
  }

  test("approx_count_distinct stays within HLL++ error bound") {
    val r = graft.queries.Relational.queries("q6_approx_distinct")(spark, sf).collect()
    r.foreach { row =>
      val approx = row.getLong(1).toDouble
      val exact = row.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"approx $approx vs exact $exact off by >10%")
    }
  }
}
