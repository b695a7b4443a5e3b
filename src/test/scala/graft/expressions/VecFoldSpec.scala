package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** VecFold must be BIT-identical to the aggregate(zip_with(...)) fold it
  * replaces — including null poisoning, length-mismatch null-padding and
  * empty-array zero — because ~25 oracle-hashed queries consume it. */
class VecFoldSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc: Column, x: Column) => acc + x)

  private def hofL2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc: Column, x: Column) => acc + x)

  test("dot/l2sq bit-match the HOF fold on random float arrays (property)") {
    val arrGen = Gen.listOfN(64, Gen.chooseNum(-4.0f, 4.0f))
    val cases = Gen.listOfN(200, Gen.zip(arrGen, arrGen)).sample.get
    val rows = cases.toDF("a", "b")
      .select(
        VecFold.dot_fold(col("a"), col("b")).as("d"),
        hofDot(col("a"), col("b")).as("dref"),
        VecFold.l2sq_fold(col("a"), col("b")).as("l"),
        hofL2(col("a"), col("b")).as("lref"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
  }

  test("edge parity: null array, length mismatch, null element, empty, NaN") {
    val cases: Seq[(Option[Seq[Option[Float]]], Option[Seq[Option[Float]]])] =
      Seq(
        (None, Some(Seq(Some(1f)))),
        (Some(Seq(Some(1f), Some(2f))), Some(Seq(Some(3f)))),
        (Some(Seq(Some(1f), None)), Some(Seq(Some(3f), Some(4f)))),
        (Some(Seq()), Some(Seq())),
        (Some(Seq(Some(Float.NaN), Some(2f))), Some(Seq(Some(1f), Some(2f)))),
        (Some(Seq(Some(1.5f), Some(-2.25f))), Some(Seq(Some(0.5f), Some(8f)))))
    val rows = cases.toDF("a", "b")
      .select(
        VecFold.dot_fold(col("a"), col("b")).as("d"),
        hofDot(col("a"), col("b")).as("dref"),
        VecFold.l2sq_fold(col("a"), col("b")).as("l"),
        hofL2(col("a"), col("b")).as("lref"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"dot null mismatch: $r")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"$r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"l2 null mismatch: $r")
      if (!r.isNullAt(2))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"$r")
    }
  }

  test("mixed float/double sides (literal weight arrays) bit-match") {
    val ws = Array(0.5, -1.0, 2.5, 3.25)
    val wlit = array(ws.toIndexedSeq.map(lit(_)): _*)
    val rows = Seq(Seq(1.5f, 2f, -3f, 0.125f)).toDF("v")
      .select(
        VecFold.dot_fold(col("v"), wlit).as("d"),
        hofDot(col("v"), wlit).as("dref"))
      .collect()
    assert(java.lang.Double.doubleToRawLongBits(rows(0).getDouble(0)) ==
      java.lang.Double.doubleToRawLongBits(rows(0).getDouble(1)))
  }
}
