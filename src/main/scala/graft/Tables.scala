package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata star schema (TESTDATA.md).
  *
  * All queries take a `dir` (scale-factor directory) and read parquet through
  * here so that schema quirks are handled once:
  *
  *  - `events.parquet` carries a parquet TIMESTAMP(NANOS) column, which Spark
  *    cannot read natively; we read it as a long
  *    (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microseconds,
  *    matching DuckDB's `CAST(ts AS TIMESTAMP)` truncation so oracle
  *    comparisons agree.
  *
  * At 100 TB these reads stay scan-friendly: plain parquet reads with no
  * driver-side materialization, so Catalyst pushes filters/pruning into the
  * scan (verify with `.explain`: PushedFilters / ReadSchema).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events.parquet with `ts` as a proper TimestampType (µs, truncated from
    * the source's nanoseconds — identical to DuckDB `CAST(ts AS TIMESTAMP)`).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Spread a scan across all cores when the file layout under-partitions
    * it (a single small parquet file usually holds one row group, so
    * byte-range splitting concentrates every row in one task, serializing
    * any heavy per-row compute downstream). The probe uses the file listing
    * only — no `df.rdd` (which would physically plan the scan per call).
    * On a real 100 TB layout (many files, or few large ones where byte
    * splitting works) this is a no-op — never a forced full shuffle. */
  def parallelized(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val want = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.length >= want) return df
    val hconf = spark.sparkContext.hadoopConfiguration
    val totalBytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    if (totalBytes < (1L << 30)) df.repartition(want) else df
  }
}
