package graft.io

import org.apache.spark.sql.DataFrame
import graft.etl.Identity

/** Sinks (SURVEY.md §2.1 S4-S6).
  *
  * The reference loads four tables into MySQL with per-column SQL types and
  * post-load `ADD PRIMARY KEY` DDL (`/root/reference/insert.py:70-84,
  * 169-191`). The engine's durable format is parquet (columnar, splittable,
  * statistics-bearing — the only sane 100 TB sink available offline); JDBC
  * stays behind the same interface for deployments that have a driver jar.
  */
object Writers {

  /** Write mode mirroring the reference's `if_exists='replace'`. */
  def parquet(df: DataFrame, path: String,
              partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** S6 — the engine equivalent of `ALTER TABLE ... ADD PRIMARY KEY`
    * (insert.py:188-191): constraints are not enforceable by Spark sinks,
    * so assert uniqueness before/after load. Throws on violation. */
  def assertPrimaryKey(df: DataFrame, keys: Seq[String], table: String): Unit = {
    val violations = Identity.primaryKeyViolations(df, keys)
    require(violations == 0,
      s"primary key (${keys.mkString(",")}) on $table violated by $violations keys")
  }

  /** Bucketed + sorted managed table: the layout that makes repeated
    * equi-joins/aggregations on `bucketCols` shuffle-free (asserted in
    * PhysicalPlanSpec — zero Exchange nodes in the join subtree). The
    * 100 TB pattern: land fact tables bucketed by their join key once,
    * amortize the exchange across every downstream query. */
  def bucketTable(df: DataFrame, table: String, buckets: Int,
                  bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Managed table + collected statistics: the CBO landing pattern.
    * Saves `df` as a managed parquet table and runs `ANALYZE TABLE ...
    * COMPUTE STATISTICS FOR COLUMNS ...`, giving the cost-based
    * optimizer a rowCount plus per-column NDV/min/max/null counts. At
    * 100 TB this is what turns "the filtered dim is small" from a guess
    * into a broadcast decision: without column stats a Filter's size
    * estimate equals its child's, so a selective dim filter still
    * sort-merges the fact side; with stats the estimated post-filter
    * size drops below the broadcast threshold and the join-reorder rule
    * can move the most selective join first. Both effects are asserted
    * in PhysicalPlanSpec ("ANALYZE stats flip the broadcast decision",
    * "CBO reorders the join chain"). */
  def statsTable(df: DataFrame, table: String,
                 statCols: Seq[String] = Nil): Unit = {
    val s = df.sparkSession
    // The managed-location derivation below is <warehouse>/<table>,
    // which is only the catalog's layout for the default database
    // (elsewhere it is <warehouse>/<db>.db/<table>) — refuse rather
    // than clean the wrong directory.
    require(s.catalog.currentDatabase == "default",
      s"statsTable assumes the default database; current is " +
        s"'${s.catalog.currentDatabase}'")
    require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"statsTable table name must be a bare identifier: '$table'")
    s.sql(s"DROP TABLE IF EXISTS $table")
    // A previously-failed run can orphan the managed location on disk
    // (DROP TABLE on a table the catalog no longer knows leaves the
    // dir). Resolve it via Hadoop Path/FileSystem on the warehouse URI
    // — not string math on the conf value — so file: schemes, URI
    // encoding, and non-local filesystems all resolve correctly; the
    // catalog lowercases the identifier for the directory name.
    val whPath = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    val tblPath = new org.apache.hadoop.fs.Path(
      whPath, table.toLowerCase(java.util.Locale.ROOT))
    val fs = tblPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(tblPath)) { fs.delete(tblPath, true); () }
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
    s.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS" +
      (if (statCols.nonEmpty) s" FOR COLUMNS ${statCols.mkString(", ")}"
       else ""))
  }

  /** S4 — JDBC sink: the pluggable interface the reference's
    * `insert_in_table` becomes. `createTableColumnTypes` carries the
    * per-column SQL types (the reference's `dtype={'entity_id':
    * String(36)}` maps). Exercised end-to-end against embedded Derby in
    * JdbcSpec (write → read-back → inner-join re-find, mirroring
    * insert.py:70-84 + tests.py:39-44); MySQL/Postgres swap in via `url`
    * + `properties` with no code change. */
  def jdbc(df: DataFrame, url: String, table: String,
           columnTypes: Option[String] = None,
           properties: java.util.Properties = new java.util.Properties): Unit = {
    val w = df.write.mode("overwrite")
    columnTypes.fold(w)(t => w.option("createTableColumnTypes", t))
      .jdbc(url, table, properties)
  }
}
