package graft.io

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types.{DataType, StringType}

/** Derby dialect fix-up: Spark's built-in Derby mapping renders StringType
  * as CLOB, so writing a null string through a `createTableColumnTypes`
  * VARCHAR column fails inside `setNull` (CLOB vs VARCHAR type conflict).
  * Registering this dialect (prepended, so it wins over the built-in) maps
  * strings to VARCHAR(32672) — Derby's maximum VARCHAR width — so setNull
  * works AND strings longer than a narrow default don't start failing with
  * Derby truncation errors (the dialect is global once registered, so the
  * default must accept anything the previous CLOB mapping accepted up to
  * Derby's VARCHAR ceiling). Schemas that want tighter widths say so via
  * `createTableColumnTypes`, like the reference's `String(36)`-style
  * per-column types (/root/reference/insert.py:74-84). */
object GraftDerbyDialect extends JdbcDialect {
  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:derby")

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("VARCHAR(32672)", Types.VARCHAR))
    case _ => None
  }

  /** Idempotent registration hook (register drops duplicates by identity;
    * calling twice is harmless). */
  def register(): Unit = {
    JdbcDialects.unregisterDialect(this)
    JdbcDialects.registerDialect(this)
  }
}
