package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Native Catalyst expression: SimHash over a precomputed token-hash array
  * — majority vote per bit position over the low `nBits` bits of each
  * hash, bit set where the vote is strictly positive.
  *
  * The Column-expression formulation (`nBits` separate `aggregate` folds)
  * re-traverses the hash array once PER BIT: 60 interpreted lambda passes
  * per document. This expression makes one pass total inside whole-stage
  * codegen (measured ~4× on the dedup_simhash query at sf0.1). Null
  * elements are skipped; a null array yields null.
  */
case class SimHashFromHashes(child: Expression, nBits: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 60,
    "the portable md5-derived hash carries 60 usable bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires ARRAY<BIGINT> input, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Long](nBits)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var j = 0
        while (j < nBits) {
          votes(j) += ((h >>> j) & 1L) * 2L - 1L
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < nBits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arrVar => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |long[] $votes = new long[$nBits];
         |for (int $i = 0; $i < $arrVar.numElements(); $i++) {
         |  if (!$arrVar.isNullAt($i)) {
         |    long $h = $arrVar.getLong($i);
         |    for (int $j = 0; $j < $nBits; $j++) {
         |      $votes[$j] += (($h >>> $j) & 1L) * 2L - 1L;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  if ($votes[$j] > 0) $out |= 1L << $j;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFromHashes {
  /** Column-API entry point. */
  def simhash(hashes: Column, nBits: Int): Column =
    Shim.column(SimHashFromHashes(Shim.expression(hashes), nBits))
}
