package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives for 100 TB shuffles.
  *
  * AQE's skew-join splitting covers sort-merge joins automatically; these
  * helpers cover the remaining cases — skewed aggregation/dedup keys and
  * skewed broadcast-ineligible joins — via key salting:
  *
  *  - aggregation: two-phase partial aggregate over (key, salt), then final
  *    over key. The salt fans a hot key over `buckets` reducers.
  *  - join: salt the skewed (fact) side, EXPLODE the dim side once per salt
  *    value, join on (key, salt).
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from stable row content
    * (never rand(): retries/speculative tasks must agree). */
  def salt(saltSource: Column, buckets: Int): Column =
    pmod(hash(saltSource), lit(buckets))

  /** Two-phase (salted) aggregation: sums/counts that are reassociable are
    * partially aggregated on (keys, salt) before the final combine on keys.
    * Spark's hash aggregate already does map-side partials; the explicit
    * salted exchange matters when a single key exceeds one reducer's
    * capacity (the map-side combine can't help a hot reduce partition). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltSource: Column, buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(saltSource, buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  /** Salted equi-join for a skewed left side against a modest right side:
    * left gets a content-derived salt, right is replicated `buckets`
    * times; join on keys + salt. Right-side blowup = buckets ×
    * |right| — choose buckets ≈ hot-key multiplicity / target partition
    * size. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltSource: Column, buckets: Int): DataFrame = {
    val l = left.withColumn("__salt", salt(saltSource, buckets))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
