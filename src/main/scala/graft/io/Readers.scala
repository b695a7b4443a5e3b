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

  /** JSONL (newline-delimited JSON) — the interchange format most
    * LLM-training corpora arrive in. Explicit schema: one scan, no
    * inference pass, malformed lines land in `_corrupt_record` under
    * PERMISSIVE (Spark's default) rather than failing the 100 TB job. */
  def jsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other columnar lake format; same pushdown/pruning story as
    * parquet via Spark's native vectorized reader. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S1 variant with explicit malformed-row policy. The reference's pandas
    * read silently NaN-fills short rows and its date parsing raises on bad
    * values; a production ingest needs the choice explicit:
    *  - PERMISSIVE + corrupt-record column → quarantine lane
    *    (`df.filter($"_corrupt_record".isNotNull)` is the dead-letter set)
    *  - FAILFAST → reference-style hard stop. */
  def csvWithPolicy(spark: SparkSession, path: String, schema: StructType,
                    failFast: Boolean): DataFrame = {
    val withCorrupt =
      if (failFast) schema
      else StructType(schema.fields :+
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType, nullable = true))
    spark.read
      .option("sep", ";")
      .option("header", "true")
      .option("nullValue", "")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
  }

  /** Streaming S1/S7: the unbounded directory source (new files become
    * micro-batches). The production entry point for `streaming.Streams`
    * operators; schema is mandatory for streaming reads. */
  def parquetStream(spark: SparkSession, dir: String,
                    schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)
}
