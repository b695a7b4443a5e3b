package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum equals direct group-by sum") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0))
      .toDF("k", "v").withColumn("rid", monotonically_increasing_id())
    val salted = Skew.saltedSum(df, Seq("k"), "v", col("rid"), buckets = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == Map("a" -> 6.0, "b" -> 10.0))
  }

  test("salted join fans a hot key across >= buckets shuffle partitions") {
    val buckets = 8
    // one hot key carrying 8000 of 8100 rows — the skew shape
    val left = spark.range(8000).select(lit(0L).as("k"), col("id").as("v"))
      .unionAll(spark.range(100).select((col("id") % 10 + 1).as("k"),
        col("id").as("v")))
    val right = spark.range(11).select(col("id").as("k"),
      concat(lit("seg_"), col("id")).as("seg"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      val joined = Skew.saltedJoin(left, right, Seq("k"), col("v"), buckets)
      // the shuffle key includes the salt, so partitioning is (k, __salt)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), s"salt missing from plan:\n$plan")
      // every salt value is used for the hot key (full fan-out of the
      // shuffle KEY space; the partition count below is the hash of those
      // keys into 16 reducers, where collisions are expected)
      val salts = left.withColumn("__salt", Skew.salt(col("v"), buckets))
        .filter(col("k") === 0L)
        .select("__salt").distinct().count()
      assert(salts == buckets, s"hot key uses $salts salts, want $buckets")
      val parts = joined.filter(col("k") === 0L)
        .select(org.apache.spark.sql.functions.spark_partition_id().as("p"))
        .distinct().count()
      assert(parts > buckets / 2,
        s"hot key occupies $parts partitions — not fanned out")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
  }

  test("AQE splits a skewed shuffle partition at runtime (skew join)") {
    // The runtime counterpart of manual salting: one key carries ~99% of
    // the left side; with AQE skew-join on (and thresholds scaled down to
    // test-sized data), the sort-merge join's skewed partition must be
    // split into multiple reader tasks — the final adaptive plan marks the
    // join/read with the skew flag. This is the zero-code-change
    // mitigation a 100 TB job relies on when skew is discovered at
    // runtime rather than known upfront.
    val prev = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    prev.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000)
        .select(lit(0L).as("k"), concat(lit("pad-pad-pad-pad-"),
          col("id")).as("payload"))
        .unionAll(spark.range(2000).select((col("id") % 50 + 1).as("k"),
          col("id").cast("string").as("payload")))
      val right = spark.range(51).select(col("id").as("k"),
        concat(lit("seg_"), col("id")).as("seg"))
        .repartition(8) // keep the dim side big enough to stay sort-merge
      val joined = left.join(right.hint("merge"), Seq("k"))
      // AQE finalizes the plan only on execution, and only on THIS
      // QueryExecution (df.write would clone a fresh one) — drive the
      // physical RDD directly, then inspect the finalized adaptive plan.
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally prev.keys.foreach { k =>
      if (k == "spark.sql.adaptive.enabled") spark.conf.set(k, "true")
      else spark.conf.unset(k)
    }
  }

  test("salted join equals plain join") {
    val left = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4)).toDF("k", "lv")
    val right = Seq(("a", "x"), ("b", "y")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), col("lv"), buckets = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
  }
}
