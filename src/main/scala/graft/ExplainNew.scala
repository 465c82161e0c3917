package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-audit diagnostic: prints the Exchange/Join/Scan/Window/Aggregate
  * skeleton of named driver queries — the `.explain` iteration loop as a
  * one-liner. Usage: `runMain graft.ExplainNew <sfDir> <query> [query...]`
  * (sfDir convention shared with Verify/BenchOne). */
object ExplainNew {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainNew <sfDir> <query> [query...]")
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --exec: RUN the query first (noop write) and print the AQE-final
    // executed plan — reuse decisions (ReusedExchange/ReusedSubquery) and
    // runtime join selections only exist there, not in the initial plan.
    val exec = args.contains("--exec")
    for (n <- args.drop(1).filterNot(_ == "--exec")) {
      SparkEntry.queries.get(n) match {
        case None => println(s"=== $n === (unknown query)")
        case Some(q) =>
          val df = q(spark, sfDir)
          if (exec) df.write.format("noop").mode("overwrite").save()
          val p = df.queryExecution
            .explainString(ExplainMode.fromString("simple"))
          println(s"=== $n ===")
          println(p.linesIterator
            .filter(l => l.contains("Exchange") || l.contains("Join") ||
              l.contains("Scan") || l.contains("Window") || l.contains("Aggregate"))
            .map(_.trim.take(120)).mkString("\n"))
      }
    }
    spark.stop()
  }
}
