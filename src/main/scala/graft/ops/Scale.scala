package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism hygiene for CPU-heavy per-row stages (hashing, shingling,
  * regex extraction, vector math).
  *
  * Spark sizes scan parallelism by input SPLITS, not by cost: a small
  * single-row-group parquet file is one partition, so a downstream stage
  * that does 2 ms of CPU per row runs on one core no matter how many the
  * cluster has. At 100 TB the scan arrives in thousands of splits and
  * needs no help — forcing a repartition there would shuffle the full
  * text/binary payload for nothing. So the fan-out is conditional: only
  * widen genuinely narrow inputs.
  */
object Scale {

  /** Repartition `df` to cluster parallelism IFF its current plan yields
    * fewer partitions than half the cores; otherwise pass through
    * untouched (the no-op path is the one a real cluster takes). Inspect
    * partition count via the physical RDD — metadata only, no job. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
    else df.repartition(target)
  }
}
