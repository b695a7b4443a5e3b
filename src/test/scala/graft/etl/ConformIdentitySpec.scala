package graft.etl

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ConformIdentitySpec extends SparkSpec {
  import spark.implicits._

  test("entity typing: all four null combinations (insert.py:16-25)") {
    val df = Seq(
      (Some("Jean"), Some("1990-01-01"), "PF"),
      (Some("Jean"), None, "PF"),
      (None: Option[String], Some("1990-01-01"), "PF"),
      (None: Option[String], None: Option[String], "PM")
    ).toDF("first_name", "birthday", "want")
    val got = df.select(
      Conform.entityType(col("first_name"), col("birthday")).as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("date parse + reformat (insert.py:110-115, tests.py:34-35)") {
    val df = Seq("04/03/1985").toDF("d")
    val r = df.select(
      Conform.parseDateFr(col("d")).cast("string").as("ts"),
      Conform.reformatFrToIso(col("d")).as("iso")).head()
    assert(r.getString(0) == "1985-03-04 00:00:00")
    assert(r.getString(1) == "1985-03-04")
  }

  test("surrogate id: null positions don't collide; stable across runs") {
    val df = Seq(
      (Some("a"), None: Option[String], Some("b")),
      (Some("a"), Some("b"), None: Option[String])
    ).toDF("x", "y", "z")
    val ids = df.select(Identity.surrogateId(col("x"), col("y"), col("z")))
      .collect().map(_.getString(0))
    assert(ids.distinct.length == 2, "null-position collision")
    val ids2 = df.select(Identity.surrogateId(col("x"), col("y"), col("z")))
      .collect().map(_.getString(0))
    assert(ids.sameElements(ids2))
  }

  test("dedupFirst: keeps exactly the first row under the order; idempotent") {
    val df = Seq((1, "a", 10), (1, "b", 5), (2, "c", 1)).toDF("k", "v", "ord")
    val once = Identity.dedupFirst(df, Seq("k"), Seq(col("ord")))
    assert(once.count() == 2)
    assert(once.filter(col("k") === 1).select("v").head().getString(0) == "b")
    val twice = Identity.dedupFirst(once, Seq("k"), Seq(col("ord")))
    assert(twice.collect().toSet == once.collect().toSet)
  }

  test("relation label map: dict.get semantics (insert.py:156-159)") {
    val df = Seq("espoux (e) de", "parent (e) de", "enfant (e) de", "ami de")
      .toDF("l")
    val got = df.select(Relations.mapRelationType(col("l"))).collect().map(_.getString(0))
    assert(got.sameElements(Array("SPOUSE_OF", "PARENT_OF", "CHILD_OF", null)))
  }
}
