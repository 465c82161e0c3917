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
  * Everything here is deterministic BY DEFAULT: salts derive purely from
  * row content (`xxhash64`), never from `rand()`, so retried tasks and
  * re-runs produce identical salt values under any plan — the SPARK-23207
  * class of mixed-attempt shuffle hazard is designed out. The trade-off
  * and the explicitly layout-dependent alternative are documented on
  * [[Skew.saltExpr]].
  */
object Skew {

  /** Two-phase salted aggregation for decomposable aggregates: phase 1
    * groups on (keys, salt) — a hot key's rows spread over `salts`
    * reducers — phase 2 merges the partials per key. Use when one key
    * holds a large share of the input and a single reducer would spill or
    * straggle. count/sum/min/max compose as (countPartial→sum, sum→sum,
    * min→min, max→max); pass the matching merge for each partial.
    * `positional = true` opts into the layout-dependent salt (see
    * [[saltExpr]]) when the hot key's rows are byte-identical duplicates. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
      partials: Seq[Column], merges: Seq[Column],
      positional: Boolean = false): DataFrame = {
    require(salts > 0)
    df.withColumn("__salt", saltExpr(df, salts, positional))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salt in [0, salts).
    *
    * Default (`positional = false`): pure content hash. Retry-deterministic
    * under ANY plan — a partially re-executed map stage after a fetch
    * failure re-assigns every row the same salt, so mixed-attempt shuffle
    * reads cannot double-count or drop. The cost: byte-identical duplicate
    * rows of a hot key all land in one bucket and do not spread.
    *
    * `positional = true`: mixes `monotonically_increasing_id()` into the
    * hash so identical duplicates spread too. The id is partition-layout/
    * row-order dependent, so this variant is only retry-safe when the
    * input is a deterministic scan (file/table read), NOT downstream of a
    * shuffle — caller's responsibility, enforced here only by documentation
    * because the plan cannot be inspected cheaply. The OPERATORS above are
    * assignment-independent either way (partials merge to the same final
    * per key; a join row matches its replicated partner under any salt),
    * so the positional hazard is limited to the SPARK-23207 retry window,
    * not steady-state results. */
  private def saltExpr(df: DataFrame, salts: Int, positional: Boolean): Column = {
    val content = struct(df.columns.map(col): _*)
    val h = if (positional) xxhash64(content, monotonically_increasing_id())
            else xxhash64(content)
    pmod(h, lit(salts))
  }

  /** Salted shuffle join: the skewed (big) side gets a salted key; the
    * other side is replicated `salts` times so every (key, salt) bucket
    * finds its match. Row multiplication is `salts`× the small side only
    * — bounded and chosen by the caller. Join types that null-extend the
    * REPLICATED side (right/full) are rejected: an unmatched replica
    * would surface once per salt. */
  def saltedJoin(big: DataFrame, other: DataFrame, key: String, salts: Int,
      joinType: String = "inner", positional: Boolean = false): DataFrame = {
    require(salts > 0)
    require(Set("inner", "cross", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti")
        .contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin cannot preserve right/full outer semantics (got $joinType)")
    val saltedBig = big.withColumn("__salt", saltExpr(big, salts, positional))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(replicated,
        saltedBig(key) === replicated(key) && saltedBig("__salt") === replicated("__salt"),
        joinType)
      .drop(saltedBig("__salt")).drop(replicated("__salt"))
      .drop(replicated(key))
  }
}
