package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Native sequential vector fold — Σ aᵢ·bᵢ (dot) or Σ (aᵢ−bᵢ)² (L2²) —
  * replacing the `aggregate(zip_with(a, b, f), 0.0, +)` higher-order
  * chain on the embedding hot paths. HigherOrderFunction expressions are
  * excluded from whole-stage codegen AND evaluate their lambda
  * interpreted per element (two boxed Literal updates + an eval per
  * dimension), so a 64-dim cosine against k candidates paid ~64·3·k
  * interpreted evals per row. This expression is one native loop per
  * pair and codegens into the surrounding stage.
  *
  * Bit-parity contract (oracle hashes must not move): the accumulation
  * is the identical left fold — acc starts at +0.0, each element is
  * widened to double exactly (float→double is exact), multiplied /
  * squared-diff'd in IEEE double, and added IN INDEX ORDER. Null
  * semantics replicate zip_with + aggregate precisely:
  *  - either array NULL → NULL (zip_with returns NULL);
  *  - length mismatch → NULL (zip_with null-pads the shorter side, the
  *    lambda maps the pad to NULL, `acc + NULL` poisons the fold);
  *  - any NULL element → NULL (same poisoning);
  *  - empty arrays → 0.0 (the fold's initial accumulator).
  */
case class VecFold(left: Expression, right: Expression, squaredDiff: Boolean)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean =
    t == FloatType || t == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _)) if elemOk(l) && elemOk(r) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_fold requires two ARRAY<FLOAT|DOUBLE>, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = DoubleType
  // NULL even for non-null children (length mismatch / null element).
  override def nullable: Boolean = true
  override def prettyName: String =
    if (squaredDiff) "l2sq_fold" else "dot_fold"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecFold.fold(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right), squaredDiff)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("foldRes")
      s"""java.lang.Double $r = graft.expressions.VecFold.fold(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)}, $squaredDiff);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecFold {

  /** The one fold loop (called from interpreted eval AND generated code).
    * Returns null exactly where aggregate(zip_with(...)) does. */
  def fold(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean,
           squaredDiff: Boolean): java.lang.Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na != nb) return null
    var acc = 0.0
    var i = 0
    while (i < na) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += (if (squaredDiff) { val d = x - y; d * d } else x * y)
      i += 1
    }
    acc
  }

  /** Σ aᵢ·bᵢ as the exact sequential double fold. */
  def dot_fold(a: Column, b: Column): Column =
    Shim.column(VecFold(Shim.expression(a), Shim.expression(b),
      squaredDiff = false))

  /** Σ (aᵢ−bᵢ)² as the exact sequential double fold. */
  def l2sq_fold(a: Column, b: Column): Column =
    Shim.column(VecFold(Shim.expression(a), Shim.expression(b),
      squaredDiff = true))
}
