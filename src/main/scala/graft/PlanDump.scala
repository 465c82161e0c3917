package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round deliverable harness: writes `.explain("formatted")`
  * for named driver queries to `<outDir>/<query>_<suffix>.txt`, one file
  * per query (the judge checks plan claims against these files).
  * Usage: `runMain graft.PlanDump <sfDir> <outDir> <suffix> <query> [query...]`.
  * Session geometry matches Bench (local[32], 32 shuffle partitions, AQE)
  * so the dumped initial plans are the ones the bench actually runs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <suffix> <query> [query...]")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.kryoserializer.buffer.max", "256m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.EnvConf.runtimeConf(spark)
    new java.io.File(outDir).mkdirs()
    for (n <- args.drop(3)) {
      SparkEntry.queries.get(n) match {
        case None => System.err.println(s"[plandump] unknown query: $n")
        case Some(q) =>
          try {
            val p = q(spark, sfDir).queryExecution
              .explainString(ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
              p.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            System.err.println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
