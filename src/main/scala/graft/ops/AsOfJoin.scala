package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the payload of the most
  * recent right row with `rightTs <= leftTs` within the same key.
  *
  * Spark has no built-in as-of join; per the custom-operator preference
  * order this is (a) a *composition* of built-ins rather than a custom
  * physical operator: tag both sides, UNION, and carry right payloads
  * forward with `last(_, ignoreNulls = true)` over an ordered window.
  *
  * Cost model: one shuffle on the key + one sort — identical to the
  * sort-merge join Spark would pick for an equi-join on the same key, so
  * this composition is already the right 100 TB plan (time-ordered state
  * carried per key partition, no per-row probing, no driver involvement).
  * Skewed keys: salt the key upstream (the window is per-key sequential by
  * construction — same constraint any as-of implementation has).
  *
  * Ties (`rightTs == leftTs`): the right row sorts first (inclusive
  * semantics, matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts` oracle);
  * among equal-ts right rows the one latest under `tieBreak` wins —
  * callers needing full determinism should pass a unique tie-break column.
  *
  * Caveats of the carry-forward formulation (by design, documented):
  *  - a NULL payload value in a right row is skipped by the ignoreNulls
  *    carry — an older non-null value wins. A right row whose payload is
  *    semantically "null" should encode it with a sentinel first.
  *  - with MULTIPLE payload columns, each is carried independently, so a
  *    row with mixed null/non-null payloads can contribute only its
  *    non-null columns. Pack multi-column payloads into one struct column
  *    when row-atomicity matters.
  */
object AsOfJoin {

  def backward(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      payload: Seq[String],
      tieBreak: Column): DataFrame = {

    val leftCols = left.columns.toSeq
    val l = payload.foldLeft(
      left.withColumn("__t", col(leftTs)).withColumn("__side", lit(1))
        .withColumn("__tie", lit(null).cast("long"))
    )((df, c) => df.withColumn(s"__p_$c", lit(null)))
      .select((Seq(col(key), col("__t"), col("__side"), col("__tie")) ++
        payload.map(c => col(s"__p_$c")) ++
        leftCols.filterNot(_ == key).map(col)): _*)

    val r = right
      .withColumn("__t", col(rightTs)).withColumn("__side", lit(0))
      .withColumn("__tie", tieBreak.cast("long"))
      .select((Seq(col(key), col("__t"), col("__side"), col("__tie")) ++
        payload.map(c => col(c).as(s"__p_$c"))): _*)
    val rPadded = leftCols.filterNot(_ == key)
      .foldLeft(r)((df, c) => df.withColumn(c, lit(null).cast(
        left.schema(c).dataType)))

    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(l.unionByName(rPadded))((df, c) =>
      df.withColumn(s"__asof_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w)))

    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col(s"__asof_$c").as(s"asof_$c"))): _*)
  }
}
