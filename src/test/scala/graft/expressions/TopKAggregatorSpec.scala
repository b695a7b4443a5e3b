package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Tables

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("top-k aggregate equals the window-function formulation") {
    val topk = udaf(new TopKAggregator(3))
    val c = Tables.customer(spark, "/root/testdata/sf0.001")
    val got = c.select(col("c_mktsegment"),
        struct(col("c_custkey").as("id"), col("c_acctbal").as("score")).as("s"))
      .groupBy("c_mktsegment")
      .agg(topk(col("s.id"), col("s.score")).as("top"))
      .select(col("c_mktsegment"), explode(col("top")).as("t"))
      .select(col("c_mktsegment"), col("t.id"), col("t.score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment").orderBy(desc("c_acctbal"), asc("c_custkey"))
    val want = c.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("merge keeps exactly k with deterministic tie-breaking") {
    val agg = new TopKAggregator(2)
    val h1 = agg.reduce(agg.reduce(agg.zero, ScoredId(1, 5.0)), ScoredId(2, 5.0))
    val h2 = agg.reduce(agg.reduce(agg.zero, ScoredId(3, 5.0)), ScoredId(4, 9.0))
    val out = agg.finish(agg.merge(h1, h2))
    assert(out.length == 2)
    assert(out(0) == ScoredId(4, 9.0))
    assert(out(1) == ScoredId(1, 5.0)) // tie at 5.0 → smallest id survives
  }
}
