package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate identity and keyed deduplication.
  *
  * The reference mints `uuid.uuid4()` per row (`insert.py:121-122,141-142`)
  * and dedupes relation endpoints through a driver-side dict
  * (`insert.py:132-153`). Both are nondeterministic / non-distributable;
  * this engine derives ids as sha2 over the natural key, which makes
  * dedup idempotent, embarrassingly parallel, and oracle-checkable
  * (SURVEY.md §1 "Keys & identity", §2.4 BUG-1 note: we implement the
  * *intended* both-endpoint dedup semantics, not the reference's dead
  * destination branch).
  *
  * Scale: sha2 id assignment is partition-local; `dedupFirst` is one
  * shuffle on the key (hash aggregate with map-side partial) — the natural
  * 100 TB layout is to pre-partition/bucket persisted tables by the same
  * key so repeated dedups reuse the exchange. Skewed keys are handled by
  * AQE; a salting helper is in `graft.ops.Skew`.
  */
object Identity {

  /** Field separator + null sentinel for key strings. `concat_ws` SKIPS
    * nulls, which would make (a, null, b) collide with (a, b, null) — so
    * every part is null-coalesced to a sentinel first. */
  private val Sep = "\u0001"
  private val NullSentinel = "\u0000"

  /** Canonical key string over possibly-null natural-key parts. */
  def keyString(parts: Column*): Column =
    concat_ws(Sep, parts.map(c => coalesce(c.cast("string"), lit(NullSentinel))): _*)

  /** C5 — deterministic surrogate id: sha2-256 over the natural key.
    * DuckDB equivalent: sha256(concat_ws(chr(1), coalesce(x, chr(0)), ...)). */
  def surrogateId(parts: Column*): Column = sha2(keyString(parts: _*), 256)

  /** D1 — keep exactly one row per key, deterministically: the first row
    * under `order` (pandas `keep='first'` needs an explicit total order to
    * be well-defined in a distributed setting). */
  def dedupFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** PK audit replacing the reference's `ALTER TABLE ... ADD PRIMARY KEY`
    * (insert.py:188-191): Spark sinks cannot enforce constraints, so assert
    * uniqueness instead. Returns the number of violating keys. */
  def primaryKeyViolations(df: DataFrame, keys: Seq[String]): Long =
    df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
}
