package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // Optional 3rd arg: comma-separated name-prefix filter for fast local
    // iteration (the driver always runs the full set).
    val only: String => Boolean = args.drop(2).headOption match {
      case Some(pfx) => name => pfx.split(',').exists(name.startsWith)
      case None      => _ => true
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Core conf - must be set pre-session (SPARK_GRAFT_CONF cannot): the
      // raised-cap sketch gates serialize MG buffers of 24B x 2cap; at
      // skewCap = 2,097,152 (the ci.sh sf1 line) that is ~100 MB, past
      // kryo's 64m default buffer max (measured: q68_scale KRYO_BUFFER_
      // OVERFLOW at the sf1 oracle gate). Size the buffer to the largest
      // capacity the conf line can set, not the default-cap happy path.
      .config("spark.kryoserializer.buffer.max", "256m")
      // SPARK_GRAFT_CORE_CONF="k=v,..." — PRE-session confs (core/SparkConf
      // keys the post-session SPARK_GRAFT_CONF plumbing cannot set; the
      // kryo buffer above was the first instance of this class). First use:
      // spark.io.compression.codec=zstd for the sf100 one-box sweeps, where
      // the lineitem bucketed-copy shuffle's lz4 spill transiently exceeds
      // the scratch disk (TASK_WRITE_FAILED / no space) — zstd halves the
      // shuffle footprint at a CPU cost you'd never pay on a real cluster
      // with per-node disks, so it stays an env knob, not a default.
      .config("spark.ui.enabled", "false")
    val spark = graft.core.EnvConf.coreConf(builder0).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k1=v1,k2=v2" (BenchOne's plumbing): the sf1 second
    // gate raises the sketch capacities so the lossless-below-capacity
    // oracle contract holds at the bigger value domain (tools/ci.sh).
    graft.core.EnvConf.runtimeConf(spark)
    new java.io.File(outDir).mkdirs()
    // Failures are collected and re-printed as ONE summary line at the end:
    // in r8 a testdata vintage flip failed 28 queries whose individual
    // stderr lines scrolled past unnoticed, and the correctness table
    // silently shrank. The driver's row-count diff catches it; this makes
    // the run itself say so.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    val run = SparkEntry.queries.filter(e => only(e._1))
    run.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      // NonFatal only (Bench's rule): after OutOfMemoryError etc. the JVM is
      // suspect — later "successful" result dumps could be silently wrong,
      // which is worse in a correctness gate than an aborted run.
      catch { case e if scala.util.control.NonFatal(e) =>
        failed += name -> String.valueOf(e.getMessage).linesIterator.take(1).mkString
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // A failure must never leave a prior run's parquet in place: when
        // outDir is reused (the prefix-filter arg exists for local re-runs)
        // a stale result would let the oracle compare pass on old data
        // while the summary claims the result is missing.
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(s"$outDir/$name"))
      }
    }
    if (failed.nonEmpty) {
      System.err.println(s"[verify] SUMMARY: ${failed.size}/${run.size} queries FAILED " +
        s"(missing from $outDir): ${failed.keys.mkString(",")}")
      failed.foreach { case (n, m) => System.err.println(s"[verify]   $n: $m") }
    } else
      System.err.println(s"[verify] SUMMARY: all ${run.size} queries written")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(e => only(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
