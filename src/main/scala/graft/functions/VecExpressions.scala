package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the float-vector dot product — the hot
  * inner loop of similarity search and embedding near-dup.
  *
  * The `aggregate(zip_with(...))` higher-order formulation is interpreted
  * (HOFs have no codegen) and allocates two intermediate arrays per row;
  * this expression generates a tight primitive loop via `doGenCode`, keeping
  * the whole stage inside codegen. Fold order is identical (sequential
  * left-to-right over doubles), so results — and the DuckDB oracle parity —
  * are bit-for-bit unchanged.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (isFloat(left) && isFloat(right)) {
      while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    } else {
      def get(d: ArrayData, fl: Boolean, i: Int): Double =
        if (fl) d.getFloat(i).toDouble else d.getDouble(i)
      val lf = isFloat(left); val rf = isFloat(right)
      while (i < n) { acc += get(x, lf, i) * get(y, rf, i); i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Native Catalyst expression for the INTEGER-vector dot product — the hot
  * loop of quantized (int8 scalar-quantization) similarity search (s12).
  *
  * Accumulates in LONG, so the result is EXACT (64 dims × 127² per term
  * stays far below 2⁶³): unlike the float dot, there is no fold-order
  * sensitivity at all — any engine computing the same products gets the
  * same integer, which is what makes the quantized ANN ranking
  * hash-oracle-safe. Same codegen shape as [[FloatVecDot]].
  */
case class IntVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ivec_dot expects array<int> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getInt(i).toLong * y.getInt(i).toLong; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a.getInt($i) * (long) $b.getInt($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ivec_dot"
}

/** Native Catalyst expression packing a float vector's dimension SIGNS into
  * one 64-bit word: bit j = 1 iff v[j] > 0 (s17's 1-bit quantization). The
  * `aggregate(sequence(...))` HOF form is interpreted and allocates the
  * index sequence per ROW; at 100 TB the signature is computed once per
  * vector in the same scan as the validity filter, so it must stay inside
  * whole-stage codegen. Bits beyond min(len, 64) are zero; semantics are
  * identical to the HOF it replaces, so the s17 oracle is unchanged.
  */
case class SignPack(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_pack expects array<float>, got $t")
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), 64)
    var acc = 0L
    var j = 0
    while (j < n) { if (x.getFloat(j) > 0f) acc |= 1L << j; j += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 64);
         |long $acc = 0L;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.getFloat($j) > 0f) $acc |= 1L << $j;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignPack =
    copy(child = newChild)

  override def prettyName: String = "sign_pack"
}

/** Shared per-row kernels for the sign-LSH operators (s2 ANN, d7 near-dup):
  * one implementation so the two can never drift in fold order or
  * dimension handling. */
object VecKernel {
  /** codes(t) = `bits` sign bits of dots with planes[t*bits .. t*bits+bits-1];
    * dot folds left-to-right, Float promoted to Double per element (the
    * same order as [[FloatVecDot]]). */
  def signCodes(emb: Array[Float], planes: Array[Array[Double]],
      tables: Int, bits: Int): Array[Long] = {
    val codes = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var code = 0L
      var j = 0
      while (j < bits) {
        val p = planes(t * bits + j)
        var dot = 0.0
        var i = 0
        val n = math.min(emb.length, p.length)
        while (i < n) { dot += emb(i).toDouble * p(i); i += 1 }
        if (dot > 0d) code |= 1L << j
        j += 1
      }
      codes(t) = code
      t += 1
    }
    codes
  }
}

object VecFunctions {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** dot(a, b) as a Column, sequential-fold semantics. SQL registration
    * lives in `graft.plans.GraftExtensions` (one builder list for every
    * native function — no second path to drift). */
  def vec_dot(a: Column, b: Column): Column =
    ColumnShim.column(
      FloatVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Exact integer dot(a, b) (LONG accumulator) for quantized vectors. */
  def ivec_dot(a: Column, b: Column): Column =
    ColumnShim.column(
      IntVecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Dimension signs of a float vector packed into one long (bit j = 1 iff
    * v[j] > 0; bits past min(len, 64) zero) — s17's 1-bit code. */
  def sign_pack(a: Column): Column =
    ColumnShim.column(SignPack(ColumnShim.expression(a)))
}
