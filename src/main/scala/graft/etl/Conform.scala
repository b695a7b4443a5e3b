package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema conformance: positional renames, date parsing, entity typing.
  * Reference: `/root/reference/insert.py:102-125`. */
object Conform {

  /** Conformed column names, FR → EN, positional (insert.py:102-107). */
  val contactColumns: Seq[String] = Seq(
    "name", "first_name", "birthday", "civility", "entity_type",
    "address", "zip_code", "city", "country", "phone_number")
  val contractColumns: Seq[String] = Seq(
    "name", "first_name", "birthday", "contract_number", "open_at",
    "isin", "count", "unit_price", "date_price", "value")
  val relationColumns: Seq[String] = Seq(
    "name_s", "first_name_s", "birthday_s",
    "name_d", "first_name_d", "birthday_d", "relation_type")

  /** P1 — positional rename; arity must match exactly (insert.py:102-107). */
  def rename(df: DataFrame, names: Seq[String]): DataFrame = {
    require(df.columns.length == names.length,
      s"rename arity ${df.columns.length} != ${names.length}")
    df.toDF(names: _*)
  }

  /** C1 — `dd/MM/yyyy` parse (insert.py:110-113). Under ANSI mode Spark
    * raises on malformed input, matching pandas' strict `to_datetime`. */
  def parseDateFr(c: Column): Column = to_timestamp(c, "dd/MM/yyyy")

  /** C2 — `yyyy-MM-dd` parse (insert.py:114-115). */
  def parseDateIso(c: Column): Column = to_timestamp(c, "yyyy-MM-dd")

  /** C3 — reformat `dd/MM/yyyy` → `yyyy-MM-dd` (tests.py:34-35). */
  def reformatFrToIso(c: Column): Column =
    date_format(parseDateFr(c), "yyyy-MM-dd")

  /** C6 — entity typing from null pattern (insert.py:16-25): both
    * `first_name` and `birthday` null → legal entity (PM), else person (PF). */
  def entityType(firstName: Column, birthday: Column): Column =
    when(firstName.isNull && birthday.isNull, "PM").otherwise("PF")
}
