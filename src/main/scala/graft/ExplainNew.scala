package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object ExplainNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val p = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      println(s"=== $n ===")
      println(p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Scan") || l.contains("Window") || l.contains("Aggregate")).map(_.trim.take(120)).mkString("\n"))
    }
    spark.stop()
  }
}
