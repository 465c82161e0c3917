package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecDot, PolyHash, RollingMinHash}

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

  /** Register every native function in an existing session's registry. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
