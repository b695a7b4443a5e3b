package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** All d² pairwise products of a d-dim vector as (i, j, p) rows,
  * 1-indexed — the Gramian/covariance expansion of the PCA pass.
  *
  * vs `explode(flatten(transform(seq, i => transform(seq, j => ...))))`:
  * the Column formulation allocates a d²-element array of structs per
  * input row and evaluates the nested lambdas INTERPRETED (two
  * HigherOrderFunctions and an element_at per product — measured 250 s
  * of executor time for 2 000 rows × 64² at sf0.1); this generator
  * streams the same rows from one native loop. Values are identical:
  * p = (double)x[i-1] · (double)x[j-1] (float→double widening exact),
  * a NULL element yields a NULL product (as the lambda's null
  * propagation did), and a vector shorter than d fails loudly (the
  * ANSI element_at out-of-bounds behavior of the old expression).
  */
case class OuterProductGenerator(child: Expression, d: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(d >= 1 && d <= 4096, s"dim in [1,4096], got $d")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"outer_product requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("p", DoubleType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() < d)
        throw new IllegalStateException(
          s"outer_product: expected $d-dim vector, got ${arr.numElements()}")
      // materialize the row's coordinates once (nullable slots)
      val xs = new Array[java.lang.Double](d)
      var k = 0
      while (k < d) {
        if (!arr.isNullAt(k))
          xs(k) = if (isFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
        k += 1
      }
      new Iterator[InternalRow] {
        private var i = 0; private var j = 0
        override def hasNext: Boolean = i < d
        override def next(): InternalRow = {
          val p: Any =
            if (xs(i) == null || xs(j) == null) null
            else java.lang.Double.valueOf(xs(i) * xs(j))
          val r = InternalRow(i + 1, j + 1, p)
          j += 1
          if (j == d) { j = 0; i += 1 }
          r
        }
      }
    }
  }

  override def prettyName: String = "outer_product"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OuterProductGenerator {
  /** Column-API entry point; use with `.as(Seq("i", "j", "p"))`. */
  def outer_product(vec: Column, d: Int): Column =
    Shim.column(OuterProductGenerator(Shim.expression(vec), d))
}
