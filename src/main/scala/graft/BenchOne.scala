package graft

import org.apache.spark.sql.SparkSession

/** Developer harness: time a subset of SparkEntry queries (args) on
  * SPARK_GRAFT_SF_DIR with the same forcing/warm-up discipline as Bench —
  * for iterating on one operator without paying the full 67-query run. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
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
    spark.sparkContext.setLogLevel("ERROR")
    // Experiment plumbing: SPARK_GRAFT_CONF="k1=v1,k2=v2" sets runtime confs
    // (e.g. spark.graft.q55.band for the frame-vs-join band experiment).
    graft.core.EnvConf.runtimeConf(spark)
    def force(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    // Warm-up on the small sibling SF when present, else on the bench dir.
    val warmDir = Option(new java.io.File(sfDir).getParentFile)
      .map(p => new java.io.File(p, "sf0.001"))
      .filter(_.isDirectory).map(_.getPath).getOrElse(sfDir)
    args.foreach(n => try force(n, warmDir) catch { case _: Throwable => () })
    // SPARK_GRAFT_PASSES trims the timed passes (default 2) for very
    // long single-query runs (e.g. the q55 frame at sf10) — the pass
    // count is printed, so a 1-pass number is self-describing.
    val nPasses = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    // SPARK_GRAFT_SPILL=1 — per-query executor spill accounting (r16):
    // a task-end listener sums memory/disk spill and shuffle write, so a
    // one-box wall can be ATTRIBUTED (spill-bound vs compute-bound)
    // instead of guessed. Printed per timed pass alongside the timing.
    val spill = sys.env.get("SPARK_GRAFT_SPILL").contains("1")
    val mem = new java.util.concurrent.atomic.AtomicLong
    val disk = new java.util.concurrent.atomic.AtomicLong
    val shw = new java.util.concurrent.atomic.AtomicLong
    if (spill) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            mem.addAndGet(m.memoryBytesSpilled)
            disk.addAndGet(m.diskBytesSpilled)
            shw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    // A failing query is NAMED and the sweep continues (Bench/Verify's r9
    // rule): a long multi-query scale sweep must not lose its tail to one
    // failure, and a failure must never be recorded as a timing.
    args.foreach { n =>
      try {
        val times = (1 to nPasses).map { _ =>
          if (spill) { mem.set(0); disk.set(0); shw.set(0) }
          val t0 = System.nanoTime(); force(n, sfDir)
          val dt = (System.nanoTime() - t0) / 1e9
          if (spill) println(f"[benchone] $n spill: dt=$dt%.2f s " +
            f"memSpill=${mem.get / 1e9}%.2f GB diskSpill=${disk.get / 1e9}%.2f GB " +
            f"shufWrite=${shw.get / 1e9}%.2f GB")
          dt
        }
        println(f"[benchone] $n: ${times.min}%.2f s (passes: ${times.map(t => f"$t%.2f").mkString(", ")})")
      } catch {
        // NonFatal only: after an OutOfMemoryError or other VirtualMachineError
        // the JVM's state is suspect, and later queries' timings would be
        // plausible-looking garbage — name the failure, then rethrow.
        case scala.util.control.NonFatal(e) =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString
          println(s"[benchone] $n: FAILED ($msg)")
        case e: Throwable =>
          println(s"[benchone] $n: FATAL (${e.getClass.getName}) — aborting sweep")
          throw e
      }
    }
    spark.stop()
  }
}
