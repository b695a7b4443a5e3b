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
