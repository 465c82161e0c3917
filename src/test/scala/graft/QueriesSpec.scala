package graft

/** Every declared query must run at sf0.001 and the oracle keys must be a
  * subset of the query keys (driver contract). */
class QueriesSpec extends SparkTestBase {

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without a query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // The frame-free scale twin must be row-for-row identical to the frame
  // query — same rows, same order (both end in ORDER BY o_orderkey), same
  // doubles bit-for-bit (the decimal sums are order-free).
  test("q55_scale equals q55_num_range_frame exactly") {
    val frame = SparkEntry.queries("q55_num_range_frame")(spark, sf).collect()
    val twin = SparkEntry.queries("q55_scale")(spark, sf).collect()
    assert(twin.length == frame.length, s"${twin.length} vs ${frame.length} rows")
    twin.zip(frame).foreach { case (t, f) => assert(t == f, s"twin $t != frame $f") }
  }

  // The rank-lookup percentile twin must reproduce the buffered-percentile
  // doubles bit-for-bit (same interpolation arithmetic, same inputs).
  test("q7_scale equals q7_percentiles exactly") {
    val buffered = SparkEntry.queries("q7_percentiles")(spark, sf).collect()
    val twin = SparkEntry.queries("q7_scale")(spark, sf).collect()
    assert(twin.length == buffered.length)
    twin.zip(buffered).foreach { case (t, f) => assert(t == f, s"twin $t != buffered $f") }
  }

  // Property pin across band widths: exercises the default width's
  // divisor snapping ($0.37 -> width 37 cents, K=1: zero full buckets,
  // everything rides the edge join) through mid ($2.50) and wide ($250,
  // K=25) bands. The twin must match the frame at every width.
  for (band <- Seq("0.37", "2.50", "250.00"))
    test(s"q55_scale equals the frame at band $$${band}") {
      spark.conf.set("spark.graft.q55.band", band)
      try {
        val frame = SparkEntry.queries("q55_num_range_frame")(spark, sf).collect()
        val twin = SparkEntry.queries("q55_scale")(spark, sf).collect()
        assert(twin.length == frame.length && twin.nonEmpty)
        twin.zip(frame).foreach { case (t, f) => assert(t == f, s"band $band: $t != $f") }
      } finally spark.conf.unset("spark.graft.q55.band")
    }

  test("q55_scale rejects a sub-cent or fractional-cent band") {
    spark.conf.set("spark.graft.q55.band", "0.001")
    try intercept[IllegalArgumentException](SparkEntry.queries("q55_scale")(spark, sf))
    finally spark.conf.unset("spark.graft.q55.band")
  }

  // Queries allowed to be empty at the tiny sf0.001 scale (threshold-based
  // pair finders; the planted near-dups exist at every SF, but keep slack).
  private val mayBeEmpty = Set("q13_anti_join", "q42_except")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
