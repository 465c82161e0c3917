package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting correctness: the salted forms must be RESULT-identical to the
  * direct forms (they only change the shuffle shape), and deterministic
  * across runs (content-derived salt, no rand()). */
class SkewSpec extends SparkTestBase {

  test("saltedAggregate equals direct groupBy for sum/count") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"), salts = 8,
        partials = Seq(sum(col("l_quantity")).as("ps"), count(lit(1)).as("pn")),
        merges = Seq(sum(col("ps")).as("s"), sum(col("pn")).as("n")))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (s, n)) =>
      assert(salted(k)._2 == n, s"count mismatch for $k")
      assert(math.abs(salted(k)._1 - s) < 1e-6 * math.abs(s), s"sum mismatch for $k")
    }
  }

  test("saltedAggregate spreads a hot key over the salt space") {
    val li = Tables.lineitem(spark, sf)
    val saltCounts = li
      .withColumn("__salt", pmod(xxhash64(struct(li.columns.map(col): _*)), lit(8)))
      .filter(col("l_returnflag") === "N") // the dominant key
      .groupBy(col("__salt")).count().collect()
    assert(saltCounts.length > 1, "hot key must land in multiple salt buckets")
  }

  test("saltedJoin equals direct join (inner and left)") {
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, sf).select(col("c_custkey").as("o_custkey"), col("c_name"))
    Seq("inner", "left").foreach { jt =>
      val direct = o.join(c, Seq("o_custkey"), jt).count()
      val salted = Skew.saltedJoin(o, c, "o_custkey", salts = 4, joinType = jt).count()
      assert(salted == direct, s"$jt: $salted != $direct")
    }
  }

  test("saltedJoin rejects join types that null-extend the replicated side") {
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, sf).select(col("c_custkey").as("o_custkey"))
    Seq("right", "full_outer").foreach { jt =>
      intercept[IllegalArgumentException](Skew.saltedJoin(o, c, "o_custkey", 4, jt))
    }
  }

  test("identical rows of a hot key still spread across salt buckets") {
    val spark0 = spark
    import spark0.implicits._
    // 1000 byte-identical rows: the default content salt collapses them
    // into one bucket (the documented trade-off); the explicitly
    // layout-dependent positional salt must spread them.
    val dup = Seq.fill(1000)(("hot", 1)).toDF("k", "v")
    val buckets = dup
      .withColumn("__salt",
        pmod(xxhash64(struct(dup.columns.map(col): _*), monotonically_increasing_id()), lit(8)))
      .select("__salt").distinct().count()
    assert(buckets > 1, "identical rows collapsed into one salt bucket")
    // and the salted aggregate is exact under BOTH salt modes
    for (positional <- Seq(false, true)) {
      val out = Skew.saltedAggregate(dup, Seq("k"), 8,
          partials = Seq(count(lit(1)).as("pn")), merges = Seq(sum(col("pn")).as("n")),
          positional = positional)
        .collect()
      assert(out.length == 1 && out(0).getLong(1) == 1000)
    }
  }

  test("salting is deterministic across runs (content-derived, not rand)") {
    val li = Tables.lineitem(spark, sf)
    def run() = Skew.saltedAggregate(li, Seq("l_linestatus"), salts = 4,
        partials = Seq(count(lit(1)).as("pn")), merges = Seq(sum(col("pn")).as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(run() == run())
  }
}
