package graft.tools
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.etl.Phone
import graft.io.Tables
object PhoneProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def shaped(s: SparkSession): DataFrame = {
      val dig = lpad(((col("c_custkey") * 48271 + 11) % 10000000000L).cast("string"), 10, "7")
      Tables.customer(s, d).select(col("c_custkey"), dig.as("dd"))
        .select(col("c_custkey"),
          when(col("c_custkey") % 8 === 0, concat(substring(col("dd"),1,3), lit("-"), substring(col("dd"),4,3), lit("-"), substring(col("dd"),7,4)))
          .when(col("c_custkey") % 8 === 1, concat(lit("("), substring(col("dd"),1,3), lit(")"), substring(col("dd"),4,3), lit("."), substring(col("dd"),7,4)))
          .when(col("c_custkey") % 8 === 2, concat(lit("001-"), substring(col("dd"),1,3), lit("-"), substring(col("dd"),4,3), lit("-"), substring(col("dd"),7,4)))
          .when(col("c_custkey") % 8 === 3, concat(lit("+1-"), substring(col("dd"),1,3), lit("-"), substring(col("dd"),4,3), lit("-"), substring(col("dd"),7,4)))
          .when(col("c_custkey") % 8 === 4, col("dd"))
          .when(col("c_custkey") % 8 === 5, substring(col("dd"),1,9))
          .when(col("c_custkey") % 8 === 6, concat(lit("0"), substring(col("dd"),1,9)))
          .otherwise(concat(substring(col("dd"),1,3), lit("-"), substring(col("dd"),4,3), lit("-"), substring(col("dd"),7,4), lit("x"), substring(col("dd"),1,2)))
          .as("phone"))
    }
    def t(name: String)(df: => DataFrame): Unit = {
      val times = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime()-t0)/1e9
      }
      println(f"$name%-28s median=${times.sorted.apply(3)}%.3f all=${times.map(x=>f"$x%.2f").mkString(",")}")
    }
    t("shaped_only")(shaped(spark))
    t("candidate_only")(shaped(spark).select(col("c_custkey"), Phone.candidate(col("phone")).as("cand")))
    t("cand_bound_then_gate")(shaped(spark)
      .select(col("c_custkey"), col("phone"), Phone.candidate(col("phone")).as("cand"))
      .select(col("c_custkey"), col("phone"), when(Phone.isPossibleNumber(col("cand")), col("cand")).as("phone_intl")))
    t("normalize_single_col")(shaped(spark).select(col("c_custkey"), col("phone"), Phone.normalize(col("phone")).as("phone_intl")))
    t("gate_with_orderby")(shaped(spark)
      .select(col("c_custkey"), col("phone"), Phone.candidate(col("phone")).as("cand"))
      .select(col("c_custkey"), col("phone"), when(Phone.isPossibleNumber(col("cand")), col("cand")).as("phone_intl"))
      .orderBy("c_custkey"))
    t("normalize_with_orderby")(shaped(spark).select(col("c_custkey"), col("phone"), Phone.normalize(col("phone")).as("phone_intl")).orderBy("c_custkey"))
    spark.stop()
  }
}
