package graft.core

import org.apache.spark.sql.SparkSession

/** The one parser for the two env-var conf channels the tools share
  * (previously copied verbatim in Bench/BenchOne/Verify — ADVICE r15):
  *
  *   - SPARK_GRAFT_CORE_CONF="k=v,..." — PRE-session confs (core/SparkConf
  *     keys the post-session channel cannot set; first use was
  *     spark.io.compression.codec=zstd for the sf100 one-box sweeps).
  *   - SPARK_GRAFT_CONF="k=v,..." — runtime SQL confs set after session
  *     start (sketch capacities, experiment knobs).
  *
  * The format is a comma-separated k=v list. A conf VALUE containing a
  * comma (e.g. extraJavaOptions) cannot be expressed in it — previously the
  * continuation fragment was dropped SILENTLY and a token like "=v" set an
  * empty-string key. Malformed fragments are now skipped LOUDLY (stderr
  * names the variable and the fragment) so a truncated value is visible at
  * launch instead of surfacing as a mystery mis-config mid-suite. */
object EnvConf {
  private def parse(env: String): Seq[(String, String)] =
    sys.env.get(env).toSeq.flatMap(_.split(',')).flatMap { tok =>
      tok.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => Some(k.trim -> v)
        case _ if tok.trim.isEmpty          => None // trailing/double comma
        case _ =>
          System.err.println(
            s"[graft] $env: skipping malformed fragment '$tok' (expected " +
              "k=v; note values containing ',' cannot be passed here)")
          None
      }
    }

  /** Fold SPARK_GRAFT_CORE_CONF into a session builder (pre-session keys). */
  def coreConf(b: SparkSession.Builder): SparkSession.Builder =
    parse("SPARK_GRAFT_CORE_CONF").foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Apply SPARK_GRAFT_CONF runtime confs to a live session. */
  def runtimeConf(spark: SparkSession): Unit =
    parse("SPARK_GRAFT_CONF").foreach { case (k, v) => spark.conf.set(k, v) }
}
