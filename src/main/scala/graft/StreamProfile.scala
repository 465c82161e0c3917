package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic: replay the p3 fixture pipeline once and
  * print each micro-batch's `durationMs` breakdown (triggerExecution,
  * queryPlanning, walCommit, getBatch, addBatch, ...) so the per-batch
  * engine overhead can be attributed instead of guessed.
  * Usage: `runMain graft.StreamProfile`. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.EnvConf.runtimeConf(spark)
    import graft.tables.GenericFloat
    val fx = "/root/reference/tests"
    val mapping = new GenericFloat("axds-netcdf-replayer-data")
    val landing = java.nio.file.Files.createTempDirectory("sp-landing")
    graft.sources.FileReplay.messages(s"$fx/replayer.json").zipWithIndex
      .foreach { case (m, i) =>
        java.nio.file.Files.write(landing.resolve(f"msg$i%03d.txt"),
          m.getBytes("UTF-8"))
      }
    val sink = new graft.sinks.InMemorySink
    // GRAFT_SCRATCH overrides the checkpoint base (experiment: WAL on
    // tmpfs vs disk).
    val ckpt = sys.env.get("GRAFT_SCRATCH") match {
      case Some(base) => java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(base), "sp-ckpt").toString
      case None => java.nio.file.Files.createTempDirectory("sp-ckpt").toString
    }
    val stream = spark.readStream.option("maxFilesPerTrigger", 1)
      .text(landing.toString)
    val t0 = System.nanoTime()
    val q = graft.streaming.Pipeline.run(stream, mapping, sink, ckpt)
    q.awaitTermination(120000)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[streamprofile] total=$dt%.2f s batches=${q.recentProgress.length}")
    q.recentProgress.foreach { p =>
      val d = p.durationMs
      println(s"[streamprofile] batch=${p.batchId} " +
        s"trigger=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
        s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
        s"plan=${d.get("queryPlanning")} walCommit=${d.get("walCommit")} " +
        s"commitOffsets=${d.get("commitOffsets")}")
    }
    spark.stop()
  }
}
