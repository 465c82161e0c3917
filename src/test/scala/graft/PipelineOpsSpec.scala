package graft

import org.apache.spark.sql.functions._

/** Fast regression pins for the r13-continued operators (t23 PII scrub,
  * e28 linear interpolation, q65 profile drift, s2_exhaustive) on
  * purpose-built miniature corpora — the oracle gates certify these
  * against DuckDB per run; this keeps the engine-side contracts under
  * plain `sbt test` so a regression surfaces in seconds. */
class PipelineOpsSpec extends SparkTestBase {

  private def docsCorpus(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t23 counts every PII class once in the text and once in the synthetic suffix") {
    // doc_id=4 ⇒ suffix carries user4@example.com, 555-004-0004, 10.4.0.1,
    // 123-45-0012, 4111-1111-1111-0028 (the doc_id-derived constructions).
    val dir = docsCorpus(Seq((4L,
      "call 555-123-4567 or write jo.e@x.io card 4111-1111-1111-1234 " +
        "ip 1.2.3.4 ssn 123-45-6789")))
    val r = SparkEntry.queries("t23_pii_scrub")(spark, dir).collect()
    assert(r.length == 1)
    val row = r(0)
    // Columns: doc_id, n_cc, n_ssn, n_phone, n_ip, n_email, scrub_len, scrub_md5
    for ((cat, i) <- Seq("cc" -> 1, "ssn" -> 2, "phone" -> 3, "ip" -> 4, "email" -> 5))
      assert(row.getLong(i) == 2L, s"n_$cat = ${row.getLong(i)}, want 2 ($row)")
  }

  test("t23 scrub is sequential: a dotted phone is a phone, not three IP octets") {
    val dir = docsCorpus(Seq((0L, "dial 555.123.4567 now")))
    val row = SparkEntry.queries("t23_pii_scrub")(spark, dir).collect()(0)
    assert(row.getLong(3) == 2L, s"dotted phone + suffix phone: $row") // n_phone
    assert(row.getLong(4) == 1L, s"only the suffix IP remains: $row")  // n_ip
  }

  private val h = 3600L * 1000000000L // 1 hour in the nanos ts vintage
  private val jan1 = 1704067200L * 1000000000L // 2024-01-01T00:00Z

  test("e28 interpolates interior gaps linearly and leaves the edges NULL") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    Seq((1L, Some("a"), Some(jan1 + h), Some(10.0)),
        (2L, Some("a"), Some(jan1 + 4 * h), Some(40.0)))
      .toDF("event_id", "event_type", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("e28_interp_linear")(spark, dir)
      .filter(col("event_type") === "a")
      .orderBy(col("slot")).collect()
    assert(rows.length == 744) // hourly grid over January
    def interpAt(i: Int): Option[Double] =
      if (rows(i).isNullAt(3)) None else Some(rows(i).getDouble(3))
    assert(interpAt(0).isEmpty, "before the first observation: NULL (no extrapolation)")
    assert(interpAt(1).contains(10.0), "observed slots pass through")
    assert(interpAt(2).contains(20.0) && interpAt(3).contains(30.0),
      s"linear interior fill, got ${interpAt(2)}/${interpAt(3)}")
    assert(interpAt(4).contains(40.0))
    assert(interpAt(5).isEmpty && interpAt(743).isEmpty,
      "after the last observation: NULL")
  }

  test("q65 flags range widening in the new vintage and stays quiet on identical splits") {
    val dir = java.nio.file.Files.createTempDirectory("pipeops").toString
    import spark.implicits._
    // Even orderkeys = vintage A (quantity 1..2), odd = vintage B (quantity 100):
    // l_quantity must flag drift (range widened); l_linenumber is identical
    // across vintages and must not.
    val ship = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    Seq((2L, 1L, 1L, 1, 1.0, 0.0, 0.0, ship, "N", "O"),
        (4L, 2L, 2L, 1, 2.0, 0.0, 0.0, ship, "N", "O"),
        (5L, 3L, 3L, 1, 100.0, 0.0, 0.0, ship, "N", "O"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_discount", "l_tax", "l_shipdate",
        "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val byCol = SparkEntry.queries("q65_profile_drift")(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(byCol("l_quantity").getBoolean(9), "quantity range widened => drift")
    assert(byCol("l_quantity").getBoolean(8), "range_widened must be true")
    assert(!byCol("l_linenumber").getBoolean(9), "identical vintages => no drift")
  }

  test("s2_exhaustive (1 table x 0 bits) returns exactly s1's brute-force ranking") {
    val s1 = SparkEntry.queries("s1_knn_brute")(spark, sf).collect().map(_.toString).toSeq
    val s2 = SparkEntry.queries("s2_exhaustive")(spark, sf).collect().map(_.toString).toSeq
    assert(s1.nonEmpty && s1 == s2)
  }
}
