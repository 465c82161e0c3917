package graft

import org.apache.spark.sql.functions._

/** Invariants of the sf1 generator (GenData) at factor 2 over the tiny
  * sf0.001 source — the properties the BENCHNOTES scaling study relies on:
  * exact ×factor fact growth, foreign-key closure (per-copy join fan-out
  * identical to the source), fixed dims untouched, fresh documents at the
  * measured dup-planting recipe, unit-norm embeddings. */
class GenDataSpec extends SparkTestBase {

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("gendata-spec").toString
    GenData.gen(spark, "/root/testdata/sf0.001", dir, 2)
    dir
  }

  private def cnt(t: String): Long = spark.read.parquet(s"$out/$t.parquet").count()

  test("fact tables scale exactly x2, dims stay fixed") {
    assert(cnt("region") == 5 && cnt("nation") == 25)
    Seq("customer", "supplier", "part", "orders", "lineitem", "events").foreach { t =>
      val src = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet").count()
      assert(cnt(t) == 2 * src, s"$t: ${cnt(t)} != 2x$src")
    }
  }

  test("key shifts keep foreign keys closed and keys unique") {
    val orders = spark.read.parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$out/customer.parquet")
    assert(orders.join(cust, col("o_custkey") === col("c_custkey"), "left_anti").count() == 0,
      "every order must still reference a customer")
    assert(orders.select("o_orderkey").distinct().count() == orders.count())
    assert(cust.select("c_custkey").distinct().count() == cust.count())
  }

  test("documents are fresh at the measured recipe") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val n = docs.count()
    val srcN = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(n == 2 * srcN)
    // planted near-dups carry the source corpus's ' dup' marker at ~4.8%
    val nd = docs.filter(col("text").endsWith(" dup")).count()
    assert(nd == (n * 239) / 5000, s"near-dup count $nd")
    // n_chars is derived, sources round-robin over the 20 source ids
    assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    assert(docs.select("source").distinct().count() == math.min(n, 20))
  }

  test("embeddings are unit-norm 64-dim") {
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    assert(e.filter(size(col("embedding")) =!= 64).count() == 0)
    val offUnit = e.select(
      abs(expr("aggregate(embedding, 0D, (a, x) -> a + cast(x AS DOUBLE) * cast(x AS DOUBLE))") - 1)
        .as("err")).filter(col("err") > 1e-5)
    assert(offUnit.count() == 0, "norms must be 1 within float tolerance")
  }

  test("events keep a ts layout Tables.events can read as TimestampType") {
    // GenData preserves the source vintage (BIGINT nanos or TIMESTAMP
    // micros); the contract is that Tables.events normalizes either to a
    // proper TimestampType.
    val ev = graft.Tables.events(spark, out)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // the +copy-us shift keeps event identity unique
    assert(ev.select("event_id").distinct().count() == ev.count())
  }
}
