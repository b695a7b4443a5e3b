package graft.ext

import graft.SparkSpec

/** Semantic checks for the on-engine learners (LearnQ) and LPA. The
  * DuckDB oracle already proves bit-exact parity; these assert the MATH
  * behaves like the named algorithm on fixtures with known answers. */
class LearnQSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("LPA merges a triangle to its min label in two rounds") {
    import spark.implicits._
    // Two disjoint triangles; symmetric edge list (the query's shape).
    def tri(a: Long, b: Long, c: Long) =
      Seq((a, b), (b, a), (a, c), (c, a), (b, c), (c, b))
    val edges = (tri(1L, 2L, 3L) ++ tri(7L, 8L, 9L)).toDF("src", "dst")
    var labels = edges.select("src").distinct()
      .selectExpr("src AS node", "src AS label")
    for (_ <- 1 to 2)
      labels = graft.queries.GraphQ.lpaRound(edges, labels)
        .localCheckpoint(true)
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).map(m).forall(_ == 1L), s"triangle A: $m")
    assert(Seq(7L, 8L, 9L).map(m).forall(_ == 7L), s"triangle B: $m")
  }

  test("logreg census is a consistent confusion matrix") {
    val r = graft.queries.LearnQ.registry("learn_logreg_gd")
      .fn(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val Seq(n, tp, fp, fn, tn) =
      Seq("n_docs", "tp", "fp", "fn", "tn")
        .map(c => row.getLong(row.fieldIndex(c)))
    assert(tp + fp + fn + tn == n, s"confusion cells != n: $row")
    val acc = row.getDouble(row.fieldIndex("accuracy"))
    assert(acc >= 0.0 && acc <= 1.0 && acc == (tp + tn).toDouble / n)
    Seq("w_tokens", "w_ttr", "w_toklen", "bias").foreach { c =>
      val w = row.getDouble(row.fieldIndex(c))
      assert(!w.isNaN && !w.isInfinite, s"$c = $w")
    }
  }

  test("pca top component is unit-norm and dominates every single dim") {
    val rows = graft.queries.LearnQ.registry("learn_pca_power_iteration")
      .fn(spark, sf).collect()
    assert(rows.length == 64)
    val loadings = rows.map(_.getDouble(1))
    val norm = math.sqrt(loadings.map(l => l * l).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"||v|| = $norm")
    val lam = rows.head.getDouble(2)
    val share = rows.head.getDouble(3)
    assert(share > 0.0 && share <= 1.0, s"var_share = $share")
    // Rayleigh bound: the top eigenvalue is >= every diagonal variance
    // C_ii = var(dim i); check against the engine-computed variances.
    import org.apache.spark.sql.functions._
    val dimVar = graft.io.Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")).as(Seq("i", "v")))
      .select(col("i"), col("v").cast("double").as("v"))
      .groupBy("i").agg(var_pop(col("v")).as("vv"))
      .agg(max("vv")).head().getDouble(0)
    assert(lam >= dimVar - 1e-9, s"lambda $lam < max dim variance $dimVar")
  }

  test("rocchio covers every holdout doc and flags correctness honestly") {
    val docs = graft.io.Tables.documents(spark, sf)
    val nHold = docs.filter("doc_id % 5 = 0").count()
    val out = graft.queries.LearnQ.registry("learn_rocchio_langid")
      .fn(spark, sf).collect()
    assert(out.length == nHold, s"${out.length} != $nHold holdout docs")
    val langs = docs.select("lang").distinct().collect()
      .map(_.getString(0)).toSet + "none"
    out.foreach { r =>
      val (actual, pred) = (r.getString(1), r.getString(2))
      assert(langs.contains(pred), s"unknown class: $pred")
      assert(r.getBoolean(3) == (actual == pred), s"bad flag: $r")
    }
  }
}
