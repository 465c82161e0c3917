package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for MULTI-dimensional data skipping —
  * the third member of the layout-for-scale family beside directory
  * partition pruning (one low-cardinality dim) and bucketed co-located
  * joins (one join key). A single `sortBy(a)` gives parquet row-group
  * min/max envelopes that prune filters on `a` and NOTHING else; sorting
  * by the interleaved z-value clusters rows so that EVERY interleaved
  * dimension's per-row-group [min, max] envelope is narrow — a selective
  * filter on any of them (or a rectangle over several) skips most row
  * groups at the footer, before a page is read. At 100 TB this is the
  * difference between a full-corpus scan and reading the handful of
  * files a two-column range predicate actually touches, with no second
  * copy of the data and no index service: the skipping rides parquet
  * statistics the readers already consult.
  *
  * Design choices, Spark-first:
  *  - The z-value is a pure EXPRESSION (shifts/masks — Morton spread via
  *    magic numbers for 2 dims, a bit-gather loop for 3+), so the layout
  *    job stays whole-stage-codegen'd end to end; no UDF, no RDD.
  *  - Dimensions are min-max scaled to `bits` unsigned bits from a
  *    one-pass global min/max aggregate folded into literals. Linear
  *    scaling is the right default for the uniform-ish key domains here;
  *    for heavily skewed dimensions pre-transform to a rank yourself
  *    (e.g. `percent_rank` or an ntile bucket) — rank-conditioning is a
  *    one-off layout cost, the curve only needs MONOTONE per-dim codes.
  *  - The write is `repartitionByRange(__z)` + `sortWithinPartitions` —
  *    a range exchange on the z-value gives globally disjoint z-spans
  *    per output file (file-level skipping), and the in-partition sort
  *    gives tight row-group spans inside each file. The helper column is
  *    dropped before the write; order is physical, not schema.
  *
  * Null handling: scaled codes place null at code 0 (nulls-first in the
  * curve) via `coalesce(code, 0)`; parquet null counts still allow
  * IS NULL pruning independently.
  *
  * Reference scope: the reference engine has no storage-layout surface
  * at all (row-at-a-time sink, `dbsink.py` writes through SQL inserts) —
  * this row extends SURVEY §2.4 "layout for scale" the same way
  * bucketing does.
  */
object ZOrder {

  /** Interleave k scaled codes, `bits` bits each, LSB-first round-robin:
    * result bit (b·k + i) = bit b of code i. k·bits must fit a signed
    * long. For k = 2 the classic 5-step Morton spread keeps the
    * expression tree small; the general path gathers bit-by-bit. */
  def interleave(codes: Seq[Column], bits: Int): Column = {
    val k = codes.length
    require(k >= 2, s"z-order needs >= 2 dimensions, got $k")
    require(k * bits <= 63, s"$k dims x $bits bits exceed a signed long")
    if (k == 2 && bits <= 32) {
      def spread(c: Column): Column = {
        var x = c
        x = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
        x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
        x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
        x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x3333333333333333L))
        x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x5555555555555555L))
        x
      }
      spread(codes(0)).bitwiseOR(shiftleft(spread(codes(1)), 1))
    } else {
      // bit-gather: sum over dims and bit positions of the selected bit,
      // shifted to its interleaved slot. Expression count k*bits <= 63 —
      // well inside codegen's 64KB method budget.
      val terms = for {
        i <- 0 until k
        b <- 0 until bits
      } yield shiftleft(shiftright(codes(i), b).bitwiseAND(lit(1L)), b * k + i)
      terms.reduce(_.bitwiseOR(_))
    }
  }

  /** Append a z-value column over `dims` (numeric columns — for dates or
    * timestamps pre-project an epoch number, e.g. `unix_date`/
    * `unix_micros`; ANSI mode rejects a direct date→double cast), each
    * min-max scaled to `bits` unsigned bits. The per-dim min/max come from ONE
    * aggregate pass whose 2k scalars fold into plan literals — cheaper
    * than any per-row window, and the scan that computes them is the
    * same corpus pass the layout job must make anyway. */
  def withZValue(df: DataFrame, dims: Seq[String], bits: Int = 16,
      out: String = "__z"): DataFrame = {
    require(dims.nonEmpty)
    // Stats over FINITE values only: one NaN in max() would make mx NaN,
    // zero the scale, and silently collapse the whole dimension's codes
    // to 0 — a layout job that "succeeds" while destroying that dim's
    // data skipping. Non-finite and null rows instead route to code 0
    // per-row (nulls-first in the curve) without touching the scale.
    def finite(c: Column): Column =
      when(!isnan(c) && abs(c) < lit(Double.PositiveInfinity), c)
    val aggs = dims.zipWithIndex.flatMap { case (d, i) =>
      Seq(min(finite(col(d).cast("double"))).as(s"mn$i"),
        max(finite(col(d).cast("double"))).as(s"mx$i"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val maxCode = (1L << bits) - 1
    val codes = dims.zipWithIndex.map { case (d, i) =>
      val mn = Option(stats.getAs[java.lang.Double](s"mn$i")).map(_.toDouble).getOrElse(0.0)
      val mx = Option(stats.getAs[java.lang.Double](s"mx$i")).map(_.toDouble).getOrElse(0.0)
      val scale = if (mx > mn) maxCode.toDouble / (mx - mn) else 0.0
      // clamp into [0, maxCode]: rows at mx land on maxCode; values the
      // finite stats never saw (a non-finite straggler) cannot produce a
      // negative or oversized code that would corrupt the interleave
      val vd = finite(col(d).cast("double"))
      coalesce(
        greatest(lit(0L), least(((vd - lit(mn)) * lit(scale)).cast("long"), lit(maxCode))),
        lit(0L))
    }
    df.withColumn(out, interleave(codes, bits))
  }

  /** Write `df` as parquet z-ordered on `dims`: range-exchange on the
    * z-value (disjoint z-spans per file → file-level skipping), sort
    * within partitions (tight row-group spans → footer-level skipping),
    * drop the helper column, write. `options` passes through to the
    * writer (e.g. a small `parquet.block.size` to force multiple row
    * groups per file in tests). */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
      partitions: Int, bits: Int = 16,
      options: Map[String, String] = Map.empty): Unit =
    withZValue(df, dims, bits)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").options(options).parquet(path)
}
