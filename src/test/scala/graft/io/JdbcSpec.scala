package graft.io

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** S4/S5 executed for real: the image ships Derby in /opt/spark/jars, so
  * the JDBC sink runs end-to-end against an embedded database — the same
  * write → read-back → inner-join re-find loop the reference performs
  * against MySQL (/root/reference/insert.py:70-84, tests.py:39-44).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  GraftDerbyDialect.register()

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("jdbc sink round-trips through embedded Derby with column types") {
    val entities = Seq(
      ("e1", "Dupont", "Jean", "PF"),
      ("e2", "Durand", "Anne", "PF"),
      ("e3", null, null, "PM")).toDF(
      "entity_id", "last_name", "first_name", "entity_type")
    Writers.jdbc(entities, url, "entity",
      columnTypes = Some("entity_id VARCHAR(36), last_name VARCHAR(64), " +
        "first_name VARCHAR(64), entity_type VARCHAR(2)"),
      properties = props)

    val back = spark.read.jdbc(url, "entity", props)
    assert(back.count() == 3)
    // per-column SQL types actually applied (Derby reports VARCHAR)
    val meta = spark.read.jdbc(url,
      """(SELECT c.columnname,
         |        CAST(c.columndatatype AS VARCHAR(128)) AS coltype
         |FROM sys.syscolumns c JOIN sys.systables t
         |  ON c.referenceid = t.tableid
         |WHERE t.tablename = 'ENTITY') AS cols""".stripMargin, props)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // Spark quotes identifiers on CREATE, so Derby preserves the case
    assert(meta("entity_id").startsWith("VARCHAR(36)"), meta.toString)
    // nulls survive the round trip
    assert(back.filter(col("entity_id") === "e3")
      .select("last_name").head.isNullAt(0))
  }

  test("jdbc re-find: loaded rows joined back by key (reference test loop)") {
    val relations = Seq(("e1", "e2", 1), ("e2", "e3", 2))
      .toDF("source_id", "target_id", "relation_type")
    Writers.jdbc(relations, url, "relation", None, props)

    val entity = spark.read.jdbc(url, "entity", props)
    val relation = spark.read.jdbc(url, "relation", props)
    val refound = relation.join(entity,
        relation("source_id") === entity("entity_id"))
      .select("source_id", "target_id", "last_name")
      .orderBy("source_id")
      .collect()
    assert(refound.length == 2)
    assert(refound(0).getString(2) == "Dupont")
  }
}
