package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, TextOps}
import graft.io.Tables

/** Dev diagnostic: stage-level timing of the containment-pairs plan. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s =="); r
    }
    // warmup
    Tables.documents(spark, sfDir).count()

    val elementSet = array_distinct(Dedup.shingles3(TextOps.tokens(col("text"))))
    val sets = t("sets+checkpoint") {
      Tables.documents(spark, sfDir)
        .select(col("doc_id").as("id"),
          sort_array(Dedup.tokenHashes(elementSet)).as("s"))
        .withColumn("sz", size(col("s")))
        .filter(col("sz") > 0)
        .localCheckpoint(true)
    }
    val prefixLen = (col("sz") - ceil(col("sz") * lit(0.5)).cast("int") + 1)
    val invA = sets.select(col("id"), col("sz"),
      explode(slice(col("s"), lit(1), prefixLen)).as("t"))
    val invB = sets.select(col("id"), explode(col("s")).as("t"))
    val cand = invA.as("a").join(invB.as("b"),
        col("a.t") === col("b.t") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    t("cand count")(println("cands: " + cand.count()))
    val inter = graft.expressions.SortedIntersectSize
      .sorted_intersect_size(col("sa"), col("sb"))
    val out = cand
      .join(sets.select(col("id").as("id_a"), col("s").as("sa"),
        col("sz").as("sz_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("s").as("sb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (inter.cast("double") / col("sz_a")).as("containment"))
      .filter(col("containment") >= 0.5)
    t("verify join")(println("out: " + out.count()))
    t("full query again") {
      Dedup.containmentPairs(Tables.documents(spark, sfDir), "doc_id",
        elementSet, 0.5).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
