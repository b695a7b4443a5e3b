package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ext.Multimodal

/** Dev diagnostic: stage-level timing of the aHash pair plan. */
object AhashProbe {
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
    Tables.documents(spark, sfDir).count() // warmup

    val assets = Multimodal.assetTable(Tables.documents(spark, sfDir))
    val staged = assets
      .withColumn("txt", decode(col("bytes"), "UTF-8"))
      .withColumn("codes", transform(
        filter(split(col("txt"), ""), c => c =!= ""),
        c => ascii(c).cast("long")))
      .withColumn("n", size(col("codes")).cast("long"))
      .withColumn("total", aggregate(col("codes"), lit(0L), _ + _))
      .withColumn("L", ceil(col("n") / 60.0).cast("int"))
    t("codes+stats only")(staged.select(col("asset_id"), col("total"))
      .write.format("noop").mode("overwrite").save())
    val bitCols = (0 until 60).map { j =>
      val seg = slice(col("codes"), col("L") * j + 1, col("L"))
      val segSum = aggregate(seg, lit(0L), _ + _)
      when(segSum * col("n") > col("total") * size(seg).cast("long"),
        lit(1L)).otherwise(lit(0L))
    }
    val hashed = staged
      .withColumn("bits", array(bitCols: _*))
      .select(col("asset_id"),
        aggregate(col("bits"), lit(0L), (a, b) => a * lit(2L) + b).as("ahash"))
    t("hashed (one side)")(hashed.write.format("noop").mode("overwrite").save())
    val ck = t("hashed localCheckpoint")(hashed.localCheckpoint(true))
    t("band pairs from checkpointed")(
      graft.ext.Dedup.simhashBandPairs(ck, "asset_id", "ahash", 4, 15, 3)
        .write.format("noop").mode("overwrite").save())
    t("band pairs from UNmaterialized hashed")(
      graft.ext.Dedup.simhashBandPairs(hashed, "asset_id", "ahash", 4, 15, 3)
        .write.format("noop").mode("overwrite").save())
    t("band pairs unmaterialized + orderBy")(
      graft.ext.Dedup.simhashBandPairs(hashed, "asset_id", "ahash", 4, 15, 3)
        .orderBy("id_a", "id_b")
        .write.format("noop").mode("overwrite").save())
    t("full query as declared")(
      graft.SparkEntry.registry("multimodal_ahash_pairs").fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
