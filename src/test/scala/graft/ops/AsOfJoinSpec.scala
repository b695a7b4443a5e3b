package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of: most recent right at-or-before each left row") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 9L, 100.0, 1L), (1L, 15L, 200.0, 2L), (2L, 6L, 300.0, 3L))
      .toDF("k", "t", "v", "rid")
    val r = AsOfJoin.backward(left, right, key = "k", leftTs = "t",
        rightTs = "t", payload = Seq("v"), tieBreak = col("rid"))
      .orderBy("k", "t")
      .collect().map(x => (x.getAs[String]("tag"), Option(x.getAs[Any]("asof_v"))))
    assert(r.toSeq == Seq(
      ("l1", Some(100.0)),   // t=10: latest right ≤ 10 is t=9
      ("l2", Some(200.0)),   // t=20: latest right ≤ 20 is t=15
      ("l3", None)))         // t=5: no right ≤ 5 for k=2
  }

  test("inclusive tie: right row at exactly the left ts wins") {
    val left = Seq((1L, 10L, "l")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 42.0, 7L)).toDF("k", "t", "v", "rid")
    val r = AsOfJoin.backward(left, right, "k", "t", "t", Seq("v"), col("rid"))
      .head()
    assert(r.getAs[Double]("asof_v") == 42.0)
  }
}
