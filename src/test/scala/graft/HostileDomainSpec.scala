package graft

import org.apache.spark.sql.functions._

/** Regression pins for the r13 hostile-domain contracts — the adversarial
  * audit (tools/gen_adversarial.py + tools/ci.sh gate 3) certifies these
  * against DuckDB per run; this spec keeps the ENGINE side of each
  * contract under plain `sbt test`, on purpose-built miniature corpora,
  * so a regression surfaces in seconds rather than at gate time.
  *
  * The unifying contract (BENCHNOTES r13): Spark 4 ANSI throws
  * DIVIDE_BY_ZERO for EVERY numeric type — double included — so any
  * statistic whose denominator can reach zero on real data (1-row groups,
  * constant groups, zero observed time) must emit NULL there, matching
  * DuckDB's native x/0. Non-finite values are MISSING: excluded from
  * decimal-exact sums, medians and histogram buckets. */
class HostileDomainSpec extends SparkTestBase {

  private def eventsCorpus(rows: Seq[(Long, Option[String], Option[Long], Option[Double])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("hostile").toString
    import spark.implicits._
    rows.toDF("event_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
  private val h = 3600L * 1000000000L // 1 hour in the nanos vintage
  private val base = 1600000000000000000L

  test("e22 spearman: a 1-row type emits NULL rho instead of an ANSI divide-by-zero") {
    val dir = eventsCorpus(Seq(
      (1L, Some("solo"), Some(base), Some(1.0)),
      (2L, Some("pair"), Some(base + h), Some(2.0)),
      (3L, Some("pair"), Some(base + 2 * h), Some(3.0))))
    for (q <- Seq("e22_spearman", "e22_scale")) {
      val rows = SparkEntry.queries(q)(spark, dir).collect()
      val solo = rows.find(_.getString(0) == "solo").get
      assert(solo.getLong(1) == 1L && solo.isNullAt(3), s"$q: $solo")
      // The 2-row type still gets a real rho (den = 2·3 = 6 ≠ 0).
      assert(!rows.find(_.getString(0) == "pair").get.isNullAt(3))
    }
  }

  test("e24 MAD: mad = 0 (constant group) emits no outliers, no crash; non-finite excluded") {
    val dir = eventsCorpus(Seq(
      (1L, Some("const"), Some(base), Some(7.0)),
      (2L, Some("const"), Some(base + h), Some(7.0)),
      (3L, Some("const"), Some(base + 2 * h), Some(Double.NaN)),
      (4L, Some("const"), Some(base + 3 * h), Some(Double.PositiveInfinity))))
    // Pre-guard this was a double job-kill: NaN→BIGINT cast, then 0/0 on
    // every row of the mad=0 group.
    assert(SparkEntry.queries("e24_mad_outliers")(spark, dir).collect().isEmpty)
  }

  test("q8 moments: a 1-row status group emits NULL variance/stddev") {
    val dir = java.nio.file.Files.createTempDirectory("hostile").toString
    import spark.implicits._
    Seq((1L, 10L, "Q", 100.0, base, "1-URGENT"),
        (2L, 11L, "F", 100.0, base, "2-HIGH"),
        (3L, 12L, "F", 200.0, base, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = SparkEntry.queries("q8_moments")(spark, dir).collect()
    val q = rows.find(_.getString(0) == "Q").get
    assert(q.getLong(1) == 1L && !q.isNullAt(2) && q.isNullAt(3) && q.isNullAt(4))
    val f = rows.find(_.getString(0) == "F").get
    assert(f.getDouble(3) == 5000.0, s"2-row variance: $f") // ((100-150)²+(200-150)²)/1
  }

  test("e19 TWAP: a user whose events all share one timestamp gets NULL twap") {
    val dir = java.nio.file.Files.createTempDirectory("hostile").toString
    import spark.implicits._
    Seq((1L, Some(13L), Some(base), Some(1.0), "click"),
        (2L, Some(13L), Some(base), Some(2.0), "click"),
        (3L, Some(14L), Some(base), Some(5.0), "view"),
        (4L, Some(14L), Some(base + h), Some(6.0), "view"))
      .toDF("event_id", "user_id", "ts", "value", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("e19_twap")(spark, dir).collect()
    val u13 = rows.find(r => !r.isNullAt(0) && r.getLong(0) == 13L).get
    // Both rows share one ts: one observation with dt = 0 ⇒ zero observed
    // time ⇒ twap undefined ⇒ NULL (DuckDB x/0 agrees).
    assert(u13.getLong(2) == 0L && u13.isNullAt(3), s"$u13")
    assert(!rows.find(r => !r.isNullAt(0) && r.getLong(0) == 14L).get.isNullAt(3))
  }

  test("e26 correlation: a constant hourly series (single shared hour) emits NULL corr") {
    val dir = eventsCorpus(Seq(
      (1L, Some("a"), Some(base), Some(1.0)),
      (2L, Some("b"), Some(base), Some(1.0))))
    val rows = SparkEntry.queries("e26_type_correlation")(spark, dir).collect()
    assert(rows.length == 1 && rows(0).getLong(2) == 1L && rows(0).isNullAt(3))
  }

  test("e20 histogram: non-finite values land in the NULL bucket, finite in real buckets") {
    val dir = eventsCorpus(Seq(
      (1L, Some("x"), Some(base), Some(3.0)),
      (2L, Some("x"), Some(base), Some(Double.NaN)),
      (3L, Some("x"), Some(base), Some(Double.PositiveInfinity)),
      (4L, Some("x"), Some(base), Some(Double.NegativeInfinity)),
      (5L, Some("x"), Some(base), None)))
    val rows = SparkEntry.queries("e20_value_histogram")(spark, dir).collect()
    val nullBucket = rows.filter(_.isNullAt(1))
    assert(nullBucket.length == 1 && nullBucket(0).getLong(2) == 4L,
      s"NaN/±Inf/null must share the NULL bucket: ${rows.mkString("; ")}")
    // lo/hi inside the null bucket still see the raw extremes.
    assert(nullBucket(0).getDouble(3) == Double.NegativeInfinity)
    assert(nullBucket(0).getDouble(4).isNaN)
    assert(rows.count(r => !r.isNullAt(1) && r.getLong(1) == 0L) == 1)
  }

  test("mm3 frames: byte windows, uncapped count, hex fingerprint — unicode/empty/long edges") {
    val dir = java.nio.file.Files.createTempDirectory("hostile").toString
    import spark.implicits._
    val longText = "x" * 1500 // 24 frames — past the old oracle's 16-cap
    Seq((1L, "naïve café", "en", "s", 10L),  // multibyte: 12 BYTES
        (2L, "", "en", "s", 0L),             // empty: one empty frame
        (3L, longText, "en", "s", 1500L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("mm3_frame_sample")(spark, dir).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc(1L).length == 1)
    // Frame 0 of the unicode doc is the UTF-8 BYTES' hex, not characters.
    val hex = byDoc(1L)(0).getString(2)
    assert(hex == "naïve café".getBytes("UTF-8").map("%02X".format(_)).mkString, hex)
    assert(byDoc(2L).length == 1 && byDoc(2L)(0).getString(2) == "")
    assert(byDoc(3L).length == (1500 - 1) / 64 + 1) // 24, uncapped
  }

  test("provision-once layouts re-provision when the source corpus changes in place") {
    // The r13 stale-layout finding (q10_scale ±1): path-tag + _SUCCESS
    // freshness kept serving the previous corpus vintage after an
    // in-place regen. The fingerprint protocol must pick up the new data.
    val dir = java.nio.file.Files.createTempDirectory("hostile").toString
    import spark.implicits._
    def write(n: Int): Unit = {
      Seq.tabulate(n)(i => (i.toLong, i.toLong, "P", 10.0, base, "1-URGENT"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      Seq.tabulate(n)(i => (i.toLong, Some(i.toLong), 1L, 1, 1.0, 100.0, 0.0, 0.0, "A", "O", base))
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus", "l_shipdate")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }
    write(10)
    def nItems() = SparkEntry.queries("q10_scale")(spark, dir)
      .agg(sum(col("n_items"))).collect()(0).getLong(0)
    assert(nItems() == 10L)
    Thread.sleep(1100) // parquet mtime granularity can be one second
    write(12)
    assert(nItems() == 12L, "bucketed layout served a stale corpus vintage")
  }

  test("q57 sketch distinct: null keys are not phantom distinct values") {
    val dir = java.nio.file.Files.createTempDirectory("hostile").toString
    import spark.implicits._
    Seq((Some(1L), Some(10L), 1L, 1, 1.0, 1.0, 0.0, 0.0, "A", "O", base),
        (Some(2L), Some(11L), 1L, 2, 1.0, 1.0, 0.0, 0.0, "A", "O", base),
        (None: Option[Long], None: Option[Long], 1L, 3, 1.0, 1.0, 0.0, 0.0, "A", "O", base))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q57_kmv_distinct")(spark, dir).collect()(0)
    // COUNT(DISTINCT) semantics: the null orderkey/partkey row counts in
    // n_rows but contributes NO distinct value (the unguarded xxhash64
    // hashed NULL to the seed — one phantom value per column).
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 2.0 && r.getLong(3) == 3L, s"$r")
  }

  test("e32 ivm: SUM retraction distinguishes 0 from NULL; zero-net groups vanish") {
    // The textbook IVM hazard: key u1 updates (A, 5.0) → (A, NULL) across
    // the split. base+delta sums net to 0, but the recompute over {NULL}
    // is NULL — only the maintained non-null count (n_vals) can tell the
    // two apart. u2's post-split delete must also net group B to zero
    // (no row), and u3 is a pure post-split insert.
    val dir = java.nio.file.Files.createTempDirectory("hostile").toString
    import spark.implicits._
    val far = base + 100 * h
    Seq((1L, 1L, "A", base, Some(5.0)),
        (2L, 1L, "A", far, None: Option[Double]),
        (3L, 2L, "B", base, Some(3.0)),
        (4L, 2L, "purchase", far, Some(9.9)),
        (5L, 3L, "C", far, Some(2.5)))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("e32_ivm_agg")(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "C"), rows.mkString("; "))
    val a = rows(0)
    assert(a.getLong(1) == 1L && a.getLong(2) == 0L && a.isNullAt(3),
      s"A must carry NULL sum (not 0) after the NULL-value update: $a")
    val c = rows(1)
    assert(c.getLong(1) == 1L && c.getLong(2) == 1L && c.getLong(3) == 2500000L, s"$c")
  }
}
