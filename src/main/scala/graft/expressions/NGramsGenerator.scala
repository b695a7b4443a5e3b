package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-valued generator (the UDTF rung of the extension ladder,
  * beside the scalar Expressions and the TopK UDAF): word n-grams of a
  * text column as (pos, ngram) rows, produced LAZILY row-by-row.
  *
  * vs `explode(transform(sequence(...), ...))`: the Column formulation
  * materializes the whole n-gram array per document before exploding —
  * for a 100 TB corpus that is a transient array allocation of the
  * entire corpus re-concatenated; the generator streams each n-gram
  * straight into the child consumption loop of GenerateExec and holds
  * one row at a time. Planned through the same Generate node as
  * explode/posexplode (ExtractGenerator), so filters on the generated
  * columns still push into the iteration.
  */
case class NGramsGenerator(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  require(n >= 1 && n <= 8, s"ngram size in [1,8], got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngrams requires STRING input, got ${other.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      // Same tokenization as TextOps.tokens: split(trim(text), "\s+").
      val toks = v.asInstanceOf[UTF8String].toString.trim.split("\\s+")
      if (toks.length < n) Iterator.empty
      else (0 to toks.length - n).iterator.map { i =>
        InternalRow(i,
          UTF8String.fromString(toks.slice(i, i + n).mkString(" ")))
      }
    }
  }

  override def prettyName: String = "ngrams"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramsGenerator {
  /** Column-API entry point; use in select with
    * `.as(Seq("pos", "ngram"))` exactly like posexplode. */
  def ngrams(text: Column, n: Int): Column =
    Shim.column(NGramsGenerator(Shim.expression(text), n))
}
