package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprinting (the classic Rabin–Karp /
  * winnowing primitive): `h(c₀…cₖ₋₁) = Σ cᵢ·B^(k-1-i) mod M` over the text's
  * bytes, with the k-byte window advanced in O(1) per position. Base 31,
  * modulus 1e9+7 — values fit a non-negative long, so results are exactly
  * reproducible anywhere (the DuckDB oracle recomputes each window
  * directly; the identity of rolling vs direct evaluation is modular
  * arithmetic, not float luck).
  *
  * The heavy loop lives in [[RollingHashKernel]] and the expressions codegen
  * a static call to it — the Spark-idiomatic shape (cf. StaticInvoke) that
  * keeps the operator inside whole-stage codegen without duplicating the
  * kernel in generated Java.
  */
object RollingHashKernel extends Serializable {
  final val MOD = 1000000007L
  final val BASE = 31L

  /** Hash of bytes[from, until) — `fold((h,c) => (h*B + c) % M, 0)`. */
  def directHash(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = (h * BASE + (bytes(i) & 0xff)) % MOD; i += 1 }
    h
  }

  /** Hash of the whole string. */
  def fullHash(s: UTF8String): Long = {
    val b = s.getBytes
    directHash(b, 0, b.length)
  }

  /** Minimum over all k-byte window hashes (the winnowing fingerprint);
    * texts shorter than k hash whole. O(n) via the rolling update. */
  def minWindowHash(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n <= k) return directHash(bytes, 0, n)
    var pow = 1L // B^(k-1) mod M
    var i = 0
    while (i < k - 1) { pow = pow * BASE % MOD; i += 1 }
    var h = directHash(bytes, 0, k)
    var min = h
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * pow % MOD + MOD) % MOD
      h = (h * BASE + (bytes(i) & 0xff)) % MOD
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** `poly_hash(text)`: whole-document polynomial hash. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects a string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    RollingHashKernel.fullHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashKernel.fullHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
  override def prettyName: String = "poly_hash"
}

/** `rolling_min_hash(text, k)`: winnowing fingerprint — min over all k-byte
  * window hashes, O(1) per window. */
case class RollingMinHash(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "window size must be positive")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hash expects a string input, got ${child.dataType}")
  override def nullSafeEval(v: Any): Any =
    RollingHashKernel.minWindowHash(v.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHashKernel.minWindowHash($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_min_hash"
}

object RollingHashFunctions {
  import org.apache.spark.sql.graftshim.ColumnShim

  def poly_hash(c: Column): Column =
    ColumnShim.column(PolyHash(ColumnShim.expression(c)))

  def rolling_min_hash(c: Column, k: Int): Column =
    ColumnShim.column(RollingMinHash(ColumnShim.expression(c), k))
}
