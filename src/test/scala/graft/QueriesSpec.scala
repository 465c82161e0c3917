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
