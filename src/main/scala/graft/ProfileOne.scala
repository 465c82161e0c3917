package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Optimization-round diagnostic: run named queries once (after the BenchOne
  * warm-up discipline) and print a per-JOB breakdown — duration, stage and
  * task counts — plus a per-query total. Overhead-dominated queries (many
  * short jobs: guards, eager checkpoints, broadcast builds, codebook
  * training) separate cleanly from compute-dominated ones here, which the
  * wall-clock alone cannot do. Usage mirrors BenchOne:
  * `SPARK_GRAFT_SF_DIR=... runMain graft.ProfileOne <query> [query...]`. */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.kryoserializer.buffer.max", "256m")
      .config("spark.ui.enabled", "false")
    val spark = graft.core.EnvConf.coreConf(builder0).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.EnvConf.runtimeConf(spark)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]() // id -> (t0, stages)
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Int, Double, Int, Int)]() // id, sec, stages, tasks
    val taskCount = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    spark.sparkContext.addSparkListener(new SparkListener {
      val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, (System.nanoTime(), e.stageIds.size))
        taskCount.put(e.jobId, new java.util.concurrent.atomic.AtomicInteger(0))
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val j = stageToJob.get(e.stageId)
        val c = taskCount.get(j)
        if (c != null) c.incrementAndGet()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(e.jobId)
        if (st != null) {
          val tc = Option(taskCount.remove(e.jobId)).map(_.get).getOrElse(0)
          done.add((e.jobId, (System.nanoTime() - st._1) / 1e9, st._2, tc))
        }
      }
    })

    def force(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
    val warmDir = Option(new java.io.File(sfDir).getParentFile)
      .map(p => new java.io.File(p, "sf0.001"))
      .filter(_.isDirectory).map(_.getPath).getOrElse(sfDir)
    args.foreach(n => try force(n, warmDir) catch { case _: Throwable => () })

    args.foreach { n =>
      done.clear()
      val t0 = System.nanoTime()
      try {
        force(n, sfDir)
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50) // let listener drain
        import scala.jdk.CollectionConverters._
        val ds = done.asScala.toVector.sortBy(_._1)
        val jobSum = ds.map(_._2).sum
        println(f"[profile] $n: total=$dt%.2f s, jobs=${ds.size}, jobTimeSum=$jobSum%.2f s, gap=${dt - jobSum}%.2f s")
        ds.foreach { case (id, sec, stages, tasks) =>
          println(f"[profile]   job=$id%4d ${sec}%6.3f s  stages=$stages%2d tasks=$tasks%4d")
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[profile] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
