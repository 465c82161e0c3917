package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecDot, IntVecDot, PolyHash, RollingMinHash, SignPack}

/** SQL surface for the engine's native expressions.
  *
  * Deploy-time: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  * injects the functions into every session built from that config — the
  * idiomatic Spark extension point. Library/test-time:
  * [[GraftExtensions.registerAll]] does the same for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** One builder triple per native function (shared between the extension
    * injection and the in-place registration). */
  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of float/double arrays"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))),
    ("ivec_dot",
      info("ivec_dot", "ivec_dot(a, b) - exact integer dot product of int arrays (long accumulator)"),
      (exprs: Seq[Expression]) => IntVecDot(exprs(0), exprs(1))),
    ("sign_pack",
      info("sign_pack", "sign_pack(v) - dimension signs of a float array packed into one long (bit j = v[j] > 0)"),
      (exprs: Seq[Expression]) => SignPack(exprs(0))),
    ("poly_hash",
      info("poly_hash", "poly_hash(text) - polynomial rolling hash of the whole string"),
      (exprs: Seq[Expression]) => PolyHash(exprs(0))),
    ("rolling_min_hash",
      info("rolling_min_hash", "rolling_min_hash(text, k) - min k-byte-window hash (winnowing fingerprint)"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1) match {
          case e if e.foldable => e.eval().asInstanceOf[Number].intValue
          case other => throw new IllegalArgumentException(
            s"rolling_min_hash window size must be a literal, got $other")
        }
        RollingMinHash(exprs(0), k)
      })
  )

  /** Sketch parameters for the SQL-registered aggregates: fixed at the
    * query-layer defaults (q57/q59) because a SQL function signature
    * cannot thread a constructor parameter. Scala callers who need other
    * capacities build `udaf(KmvSketch(k))` directly. */
  val SqlSketchK = 16384
  val SqlTopKCap = 4096
  val SqlPctCap = 65536

  /** Register every native function in an existing session's registry.
    *
    * The Aggregator-backed sketches register here (session-scoped
    * `spark.udf.register`) but NOT through the `spark.sql.extensions`
    * injection path above: `injectFunction` takes Catalyst `Expression`
    * builders, and wrapping a `ScalaAggregator` by hand means constructing
    * internal API the session normally assembles — the per-session
    * registration is the supported surface for typed UDAFs. */
  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    import org.apache.spark.sql.functions.{udaf, udf}
    spark.udf.register("kmv_sketch",
      udaf(graft.functions.Sketches.KmvSketch(SqlSketchK)))
    // Null-safe like pct_from_sketch: an outer join against a group with
    // no sketch hands the estimator a null array — propagate null, don't
    // NPE (r11 advice).
    spark.udf.register("kmv_ndv",
      udf((arr: Seq[Long]) =>
        if (arr == null) null
        else java.lang.Double.valueOf(
          graft.functions.Sketches.ndvFromSketch(arr.toArray, SqlSketchK))))
    spark.udf.register("topk_freq",
      udaf(graft.functions.Sketches.SpaceSavingTopK(SqlTopKCap)))
    spark.udf.register("topk_freq_str",
      udaf(graft.functions.Sketches.SpaceSavingTopKStr(SqlTopKCap)))
    spark.udf.register("pct_sketch",
      udaf(graft.functions.Sketches.PctSketch(SqlPctCap)))
    spark.udf.register("pct_sketch_w",
      udaf(graft.functions.Sketches.PctSketchWeighted(SqlPctCap)))
    spark.udf.register("pct_from_sketch",
      graft.functions.Sketches.pctFromSketchUdf)
  }
}
