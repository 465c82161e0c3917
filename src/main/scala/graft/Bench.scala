package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Each query is forced end-to-end with a noop datasource write (full
  * materialization of every row/column — unlike count(), which lets Catalyst
  * prune the plan). A warm-up pass on a small slice first pays the one-time
  * JVM/codegen/file-listing costs so timings measure the queries, not
  * class loading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warm-up: JVM + codegen + parquet footers (smallest SF keeps it cheap),
    // plus one untimed scan of each bench-SF table so the first timed query
    // doesn't absorb the file-system cold read.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings").foreach { t =>
      try Tables.table(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }

    // Two timed passes, min per query: smooths one-off GC/IO noise without
    // hiding real costs (both passes are fully materialized runs).
    def timedPass(): Map[String, Double] = names.map { name =>
      val t0 = System.nanoTime()
      try force(name) catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val p1 = timedPass(); val p2 = timedPass()
    val results = names.map(n => n -> math.min(p1(n), p2(n)))
    // Millisecond precision keeps the line compact enough that all ~75
    // per-query timings survive the driver's tail capture (r2 lost the
    // d-entries off the front with full-precision doubles).
    // Locale.ROOT: the f-interpolator honors the default locale, and a
    // comma decimal separator would corrupt the JSON line.
    def sec(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val total = sec(results.map(_._2).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
