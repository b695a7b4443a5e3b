package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY.md §2.1).
  *
  * S1 — the reference reads `;`-separated CSV with a header and inferred
  * dtypes (`/root/reference/read_file.py:5-6`). At 100 TB `inferSchema`
  * means a second full scan, so the engine takes an explicit schema by
  * default and offers inference only for small/interactive parity use.
  */
object Readers {

  /** S1 — semicolon CSV with explicit schema (production path: one scan,
    * pushdown-capable, deterministic types). Empty strings → null like
    * pandas' NaN. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("nullValue", "")
      .schema(schema)
      .csv(path)

  /** S1 (interactive parity variant) — inferred dtypes like `pd.read_csv`.
    * NOT for the 100 TB path: inference is an extra scan. */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("nullValue", "")
      .option("inferSchema", "true")
      .csv(path)

  /** S7 — parquet scan (the harness fact path). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
