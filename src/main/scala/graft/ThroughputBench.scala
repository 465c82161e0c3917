package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Faithful-layer throughput: messages/second through the full
  * decode→mapping→dedup path, the number comparable to the reference's
  * single-threaded consume loop (implied envelope O(10²–10³) msg/s —
  * BASELINE.md: one Python callback + one INSERT per message).
  *
  * Input replicates a reference fixture to ~`target` messages (distinct
  * keys via a per-copy suffix so upsert dedup does real work), then times
  * `transformWithOffset → dedupLastWins → noop write` end-to-end.
  * Not driver-run — invoke with `sbt "runMain graft.ThroughputBench"`.
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val target = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-throughput")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val cases = Seq(
      ("GenericFloat", "replayer.json", new graft.tables.GenericFloat("t")),
      ("NumurusData", "numurus.data.json", new graft.tables.NumurusData("t")),
      ("NwicFloatReports", "health_and_status.json", new graft.tables.NwicFloatReports("t")))

    cases.foreach { case (name, fixture, mapping) =>
      val msgs = graft.sources.FileReplay.messages(s"/root/reference/tests/$fixture")
      val copies = math.max(1, target / msgs.size)
      // Real per-copy key diversity: rewrite the uid-bearing VALUE
      // ("uid" for GenericFloat fixtures, "imei" for the flatten
      // mappings) to carry the copy id, so dedup/upsert works over
      // ~n distinct natural keys instead of collapsing to a handful.
      val uidKey = if (fixture == "replayer.json") "uid" else "imei"
      val df = spark.range(copies).select(col("id"))
        .crossJoin(msgs.zipWithIndex.toDF("value", "i"))
        .select(concat(lit("k"), col("id")).as("key"),
          regexp_replace(col("value"),
            lit("\"" + uidKey + "\"\\s*:\\s*"),
            concat(lit("\"" + uidKey + "\": \""), col("id").cast("string"), lit("x\", \"" + uidKey + "_orig\": ")))
            .as("value"),
          (col("id") * msgs.size + col("i")).as("__offset"))
      val n = copies * msgs.size
      // warm-up then two timed passes
      def pass(): Double = {
        val t0 = System.nanoTime()
        sinks.UpsertSink.writeBatch(
          mapping.transformWithOffset(df), mapping, new NoopSink)
        (System.nanoTime() - t0) / 1e9
      }
      pass()
      val sec = math.min(pass(), pass())
      println(f"[throughput] $name: $n msgs in $sec%.2f s = ${n / sec}%.0f msg/s")
    }
    spark.stop()
  }

  /** Executor-side no-op row sink (consumes the iterator, writes nothing). */
  class NoopSink extends graft.sinks.RowSink {
    def upsertPartition(mapping: graft.core.TableMapping[_ <: Product],
        cols: Seq[String], rows: Iterator[org.apache.spark.sql.Row]): Unit =
      rows.foreach(_ => ())
  }
}
