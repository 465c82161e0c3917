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
    df.withColumn("__salt", saltExpr(df, salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salt in [0, salts): content hash mixed with the row's position id so
    * byte-identical rows of a hot key (the common duplicate-heavy skew
    * case) still spread across buckets. The position component makes the
    * value layout-dependent but the OPERATORS using it are assignment-
    * independent: decomposable partials merge to the same final per key,
    * and a big-side join row matches its replicated partner under any
    * salt value. */
  private def saltExpr(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col): _*), monotonically_increasing_id()),
      lit(salts))

  /** Salted shuffle join: the skewed (big) side gets a salted key; the
    * other side is replicated `salts` times so every (key, salt) bucket
    * finds its match. Row multiplication is `salts`× the small side only
    * — bounded and chosen by the caller. Join types that null-extend the
    * REPLICATED side (right/full) are rejected: an unmatched replica
    * would surface once per salt. */
  def saltedJoin(big: DataFrame, other: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(Set("inner", "cross", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti")
        .contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin cannot preserve right/full outer semantics (got $joinType)")
    val saltedBig = big.withColumn("__salt", saltExpr(big, salts))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated,
        saltedBig(key) === replicated(key) && saltedBig("__salt") === replicated("__salt"),
        joinType)
      .drop(saltedBig("__salt")).drop(replicated("__salt"))
      .drop(replicated(key))
  }
}
