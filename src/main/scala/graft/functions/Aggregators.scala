package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (SURVEY.md §2.4 "UDF surface": the reference
  * registers no UDAF, so this is the engine's idiomatic extension point —
  * `Aggregator[IN, BUF, OUT]` compiles into the same partial/final
  * hash-aggregate pipeline as built-ins, shuffling only buffers).
  *
  * ExactMedian is deliberately order-INsensitive (collect, sort at finish),
  * so its result is bit-stable across partition layouts — unlike a float
  * sum, it can be oracle-hashed at any scale factor. Buffers grow with
  * group size: the exact form for small groups; `percentile_approx` is the
  * sketch path when a single group would not fit an executor. Even-sized
  * groups interpolate (mean of the middle two), matching DuckDB/Postgres
  * `median`. */
object ExactMedian extends Aggregator[Double, List[Double], Double] {
  def zero: List[Double] = Nil
  def reduce(b: List[Double], a: Double): List[Double] = a :: b
  def merge(a: List[Double], b: List[Double]): List[Double] = a reverse_::: b
  def finish(b: List[Double]): Double = {
    val s = b.toArray
    java.util.Arrays.sort(s)
    if (s.isEmpty) Double.NaN
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }
  def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder[List[Double]]()
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
