package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Scale.fanOut contract: widen genuinely narrow inputs, touch nothing
  * else, and never break scan-level pushdown. */
class ScaleSpec extends SparkSpec {

  test("fanOut widens a single-partition plan to cluster parallelism") {
    val df = spark.range(1000).coalesce(1).toDF()
    val out = Scale.fanOut(df)
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.count() == 1000)
  }

  test("fanOut is an identity pass-through on already-parallel input") {
    val df = spark.range(1000)
      .repartition(spark.sparkContext.defaultParallelism).toDF()
    val out = Scale.fanOut(df)
    assert(out eq df, "expected the SAME DataFrame object back (no-op path)")
  }

  test("filters still reach the parquet scan through the fan-out") {
    val pruned = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 10)
      .select("doc_id")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("LessThan(doc_id,10)"),
      s"filter did not push through fanOut's repartition:\n$scan")
  }
}
