package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("byte_histogram is callable from SQL after registration") {
    GraftFunctions.register(spark)
    Seq("abc").toDF("t").createOrReplaceTempView("ext_t")
    val r = spark.sql(
      "SELECT byte_histogram(encode(t, 'UTF-8'), 16) AS h FROM ext_t")
      .head().getSeq[Long](0)
    assert(r.sum == 3 && r(6) == 3)
    val r2 = spark.sql(
      "SELECT byte_histogram(encode(t, 'UTF-8')) AS h FROM ext_t")
      .head().getSeq[Long](0)
    assert(r2.sum == 3)
  }
}
