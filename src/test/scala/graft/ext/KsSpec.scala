package graft.ext

import graft.SparkSpec

/** Known-distribution checks for the two-sample KS statistic
  * (profile_ks_test). The oracle proves engine parity; these pin the
  * STATISTIC: D_max on hand-computable ECDFs and the identical-sample
  * zero case. */
class KsSpec extends SparkSpec {

  private def ks(a: Seq[Double], b: Seq[Double]) = {
    import spark.implicits._
    val obs = (a.map((true, _)) ++ b.map((false, _))).toDF("g", "v")
    graft.queries.Warehouse.ksTest(obs).head()
  }

  test("shifted uniform samples: D_max = 0.5 exactly") {
    // a = {1..10}, b = {6..15}: ECDFs diverge maximally at v in [10, 11):
    // F_a = 1.0, F_b = 0.5.
    val r = ks((1 to 10).map(_.toDouble), (6 to 15).map(_.toDouble))
    assert(r.getLong(0) == 10L && r.getLong(1) == 10L)
    assert(r.getLong(2) == 15L, "distinct values in the union")
    assert(r.getDouble(3) == 0.5, s"ks_stat: ${r.getDouble(3)}")
    // 1.36 * sqrt(1/10 + 1/10) ~ 0.608 > 0.5 -> cannot reject at n=10
    assert(!r.getBoolean(5))
  }

  test("identical samples: D_max = 0") {
    val xs = Seq(1.0, 2.0, 2.0, 3.0, 7.5)
    val r = ks(xs, xs)
    assert(r.getDouble(3) == 0.0)
    assert(!r.getBoolean(5))
  }

  test("disjoint supports: D_max = 1, rejected once n is large enough") {
    // n=3 each: critical = 1.36*sqrt(2/3) ~ 1.11 — even D=1 cannot
    // reject (the test is honest about tiny samples).
    val small = ks(Seq(1.0, 2.0, 3.0), Seq(10.0, 11.0, 12.0))
    assert(small.getDouble(3) == 1.0)
    assert(!small.getBoolean(5))
    // n=10 each: critical = 1.36*sqrt(0.2) ~ 0.608 < 1 -> reject.
    val big = ks((1 to 10).map(_.toDouble), (11 to 20).map(_.toDouble))
    assert(big.getDouble(3) == 1.0)
    assert(big.getBoolean(5))
  }
}
