package graft.expressions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** OuterProductGenerator must emit exactly the rows of the nested
  * transform/element_at expansion it replaced (same 1-based indices,
  * bit-identical products, null-element propagation). */
class OuterProductSpec extends SparkSpec {
  import spark.implicits._

  private val D = 8

  private def hofProds(df: org.apache.spark.sql.DataFrame) = {
    val seq0 = sequence(lit(0), lit(D - 1))
    def el(i: org.apache.spark.sql.Column) =
      element_at(col("v"), i + 1).cast("double")
    df.select(explode(flatten(transform(seq0, i =>
        transform(seq0, j => struct((i + 1).as("i"), (j + 1).as("j"),
          (el(i) * el(j)).as("p")))))).as("e"))
      .select(col("e.i"), col("e.j"), col("e.p"))
  }

  test("matches the nested-transform expansion on random float vectors") {
    val vecGen = Gen.listOfN(D, Gen.chooseNum(-4.0f, 4.0f))
    val rows = Gen.listOfN(30, vecGen).sample.get.toDF("v")
    val ref = hofProds(rows).collect().map(r =>
      (r.getInt(0), r.getInt(1),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2))))
    val got = rows.select(OuterProductGenerator
        .outer_product(col("v"), D).as(Seq("i", "j", "p")))
      .collect().map(r =>
        (r.getInt(0), r.getInt(1),
          java.lang.Double.doubleToRawLongBits(r.getDouble(2))))
    assert(got.toSeq == ref.toSeq)
  }

  test("null vector emits no rows; null element yields null product") {
    val df = Seq(
      (1L, None: Option[Seq[Option[Float]]]),
      (2L, Some((1 to D).map(i => Some(i.toFloat)).updated(2,
        None: Option[Float])))).toDF("id", "v")
    val got = df.select(col("id"), OuterProductGenerator
        .outer_product(col("v"), D).as(Seq("i", "j", "p")))
    assert(got.filter(col("id") === 1L).count() == 0)
    val nulls = got.filter(col("id") === 2L && col("p").isNull).count()
    // row/col 3 are null: 2*D - 1 null products
    assert(nulls == 2 * D - 1, s"got $nulls")
  }
}
