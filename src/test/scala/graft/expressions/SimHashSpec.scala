package graft.expressions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.SparkSpec

/** The one-pass native simhash must agree with a direct Scala reference
  * (per-bit majority vote) on arbitrary hash arrays. */
class SimHashSpec extends SparkSpec {
  import spark.implicits._

  private def reference(hs: Seq[Long], nBits: Int): Long = {
    val votes = Array.fill(nBits)(0L)
    hs.foreach { h =>
      (0 until nBits).foreach { j =>
        votes(j) += ((h >>> j) & 1L) * 2L - 1L
      }
    }
    (0 until nBits).map(j => if (votes(j) > 0) 1L << j else 0L).sum
  }

  test("matches the per-bit majority-vote reference (property)") {
    val hashGen = Gen.chooseNum(0L, (1L << 60) - 1)
    val arrGen = Gen.listOf(hashGen)
    val samples = Gen.listOfN(200, arrGen).sample.get
    for (nBits <- Seq(1, 32, 60)) {
      val got = samples.toDF("hs")
        .select(SimHashFromHashes.simhash(col("hs"), nBits))
        .collect().map(_.getLong(0))
      samples.zip(got).foreach { case (hs, g) =>
        assert(g == reference(hs, nBits), s"nBits=$nBits hs=$hs")
      }
    }
  }

  test("empty array votes all-negative (zero); null array is null") {
    val df = Seq(Some(Seq.empty[Long]), None).toDF("hs")
      .select(SimHashFromHashes.simhash(col("hs"), 60).as("s"))
    val rows = df.collect()
    assert(rows(0).getLong(0) == 0L)
    assert(rows(1).isNullAt(0))
  }
}
