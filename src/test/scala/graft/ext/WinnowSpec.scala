package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** Winnowing (SIGMOD'03) guarantees and the CMS overestimate property. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fingerprints(texts: Seq[(String, String)]): Map[String, Set[Long]] = {
    val sh = Dedup.shingles3(TextOps.tokens(col("text")))
    texts.toDF("id", "text")
      .select(col("id"), TextOps.winnow(Dedup.tokenHashes(sh), 4).as("fps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
  }

  test("shared run of >= w+k-1 tokens implies a shared fingerprint (property)") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val words = Gen.listOfN(30, word)
    // w=4 window over k=3 shingles: a shared run of 6 tokens guarantees
    // >= 4 consecutive shared shingles = one full shared window.
    val sharedRun = Gen.listOfN(6, word)
    val cases = Gen.listOfN(25, for {
      a <- words; b <- words; run <- sharedRun
    } yield (a, b, run)).sample.get
    cases.zipWithIndex.foreach { case ((a, b, run), i) =>
      val docA = (a ++ run).mkString(" ")
      val docB = (run ++ b).mkString(" ")
      val fps = fingerprints(Seq(("a", docA), ("b", docB)))
      assert(fps("a").intersect(fps("b")).nonEmpty,
        s"case $i: no shared fingerprint for shared run ${run.mkString(" ")}")
    }
  }

  test("winnow density is ~2/(w+1) and never empty for long docs") {
    val doc = (1 to 500).map(i => s"tok$i").mkString(" ")
    val fps = fingerprints(Seq(("d", doc)))("d")
    val nShingles = 500 - 2
    assert(fps.nonEmpty && fps.size < nShingles,
      s"expected a strict sample, got ${fps.size} of $nShingles")
  }

  test("short doc (< w hashes) yields an empty fingerprint set, not an error") {
    val fps = fingerprints(Seq(("s", "just three tokens here")))
    assert(fps("s").isEmpty)
  }

  test("substring-span pairs: ordered ids, exact 3-gram evidence, threshold") {
    val rows = graft.SparkEntry.registry("dedup_substring_spans")
      .fn(spark, "/root/testdata/sf0.001").collect()
    rows.foreach { r =>
      val (a, b) = (r.getLong(r.fieldIndex("id_a")), r.getLong(r.fieldIndex("id_b")))
      assert(a < b, s"unordered pair ($a, $b)")
      assert(r.getLong(r.fieldIndex("n_shared")) >= 3)
      assert(r.getString(r.fieldIndex("sample_gram")).split(" ").length == 3,
        "sample_gram must be a 3-token shingle")
    }
  }

  test("count-min estimate is always >= the exact count") {
    val rows = graft.SparkEntry.registry("sketch_count_min")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(r.fieldIndex("exact_n"))
      val est = r.getLong(r.fieldIndex("cms_estimate"))
      assert(est >= exact, s"user ${r.get(0)}: est $est < exact $exact")
    }
  }
}
