package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at scale.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`, on in Bench) is
  * the first line of defense; these are the explicit forms for the cases
  * AQE cannot rewrite — a skewed AGGREGATION (AQE only splits joins), and
  * a shuffle join against a side too big to broadcast where one key
  * dominates.
  *
  * Everything here is deterministic: salts derive from row content
  * (`xxhash64`), never from `rand()`, so retried tasks and re-runs
  * produce identical results — a correctness requirement under Spark's
  * task-retry model, not a style choice.
  */
object Skew {

  /** Two-phase salted aggregation for decomposable aggregates: phase 1
    * groups on (keys, salt) — a hot key's rows spread over `salts`
    * reducers — phase 2 merges the partials per key. Use when one key
    * holds a large share of the input and a single reducer would spill or
    * straggle. count/sum/min/max compose as (countPartial→sum, sum→sum,
    * min→min, max→max); pass the matching merge for each partial. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(salts > 0)
    val saltCol = pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)).as("__salt")
    df.withColumn("__salt", saltCol)
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted shuffle join: the skewed (big) side gets a content-derived
    * salt in [0, salts); the other side is replicated `salts` times so
    * every (key, salt) bucket finds its match. Row multiplication is
    * `salts`× the small side only — bounded and chosen by the caller. */
  def saltedJoin(big: DataFrame, other: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated,
        saltedBig(key) === replicated(key) && saltedBig("__salt") === replicated("__salt"),
        joinType)
      .drop(saltedBig("__salt")).drop(replicated("__salt"))
      .drop(replicated(key))
  }
}
