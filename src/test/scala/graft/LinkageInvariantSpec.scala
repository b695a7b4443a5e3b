package graft

import org.apache.spark.sql.Row

/** Semantic invariants of the data-integration wave (LinkageQ) — the
  * properties Fellegi–Sunter, blocking audits, truth discovery, KMV schema
  * matching and g3 FD discovery must satisfy regardless of the fixture, so
  * they complement the DuckDB hash gate (which also passes when both
  * engines share the same misconception). Run at sf0.001 for speed.
  */
class LinkageInvariantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def rows(name: String): Array[Row] =
    SparkEntry.registry(name).fn(spark, sf).collect()

  test("FS census: m and u are distributions; name-agreeing patterns link") {
    val r = rows("linkage_fellegi_sunter")
    assert(r.nonEmpty && r.length <= 8)
    // m and u each sum to 1 over the pattern space (they are conditional
    // pattern distributions given match / non-match)
    val mSum = r.map(_.getAs[Double]("m_prob")).sum
    val uSum = r.map(_.getAs[Double]("u_prob")).sum
    assert(math.abs(mSum - 1.0) < 1e-9, s"m sums to $mSum")
    assert(math.abs(uSum - 1.0) < 1e-9, s"u sums to $uSum")
    r.foreach { row =>
      assert(row.getAs[Long]("n_match") <= row.getAs[Long]("n_pairs"))
      // exact-name agreement implies a true match in this fixture (names
      // are unique per customer), so those patterns must all be links
      if (row.getAs[Int]("name_eq") == 1)
        assert(row.getAs[String]("verdict") == "link",
          s"name-agreeing pattern not linked: $row")
    }
  }

  test("blocking audit: ratios in range, passes reconcile, matches bounded") {
    val Array(r) = rows("linkage_blocking_audit")
    val cand = r.getAs[Long]("cand_pairs")
    assert(cand <= r.getAs[Long]("total_pairs"))
    // each pass contributes at most every candidate; union at least max
    assert(r.getAs[Long]("conj_pairs") <= cand)
    assert(r.getAs[Long]("name_pairs") <= cand)
    assert(r.getAs[Long]("conj_pairs") + r.getAs[Long]("name_pairs")
      >= cand)
    val rr = r.getAs[Double]("reduction_ratio")
    val pc = r.getAs[Double]("pair_completeness")
    assert(rr > 0.5 && rr < 1.0, s"reduction ratio $rr")
    assert(pc > 0.9 && pc <= 1.0, s"pair completeness $pc")
    assert(r.getAs[Long]("matches_in_cand") <=
      r.getAs[Long]("n_true_matches"))
    // B is a strict subset of A's keys
    assert(r.getAs[Long]("n_b") < r.getAs[Long]("n_a"))
  }

  test("truth discovery: trust tracks injected noise; iteration helps") {
    val r = rows("fusion_truth_discovery")
    val by = r.map(row => row.getAs[String]("source") -> row).toMap
    assert(by.keySet == Set("source_1", "source_2", "source_3",
      "consensus_r1", "consensus_r2"))
    // trust ordering must recover the injected error-rate ordering
    // (5% < 20% < 33% corruption)
    val t1 = by("source_1").getAs[Double]("trust")
    val t2 = by("source_2").getAs[Double]("trust")
    val t3 = by("source_3").getAs[Double]("trust")
    assert(t1 > t2 && t2 > t3, s"trust ordering broken: $t1 $t2 $t3")
    // consensus beats the WORST source, and the trust-weighted round
    // cannot be worse than the unweighted one on this fixture
    val a1 = by("consensus_r1").getAs[Double]("accuracy")
    val a2 = by("consensus_r2").getAs[Double]("accuracy")
    assert(a1 > by("source_3").getAs[Double]("accuracy"))
    assert(a2 >= a1, s"trust-weighted round regressed: $a1 -> $a2")
    r.foreach { row =>
      val a = row.getAs[Double]("accuracy")
      assert(a >= 0.0 && a <= 1.0)
    }
  }

  test("schema matching: KMV agrees with exact on decided pairs") {
    val r = rows("schema_match_kmv")
    assert(r.length == 12) // 4 customer cols x 3 supplier cols
    r.foreach { row =>
      val kmv = row.getAs[Double]("jaccard_kmv")
      val exact = row.getAs[Double]("jaccard_exact")
      assert(kmv >= 0.0 && kmv <= 1.0)
      assert(exact >= 0.0 && exact <= 1.0)
      assert(row.getAs[Long]("k_used") > 0)
      assert(row.getAs[Long]("n_both") <= row.getAs[Long]("k_used"))
    }
    // when both value sets fit inside the sketch, KMV degrades to the
    // exact Jaccard — bit-equal, not just close
    r.filter(row => row.getAs[Long]("ndv_a") + row.getAs[Long]("ndv_b")
        <= 256).foreach { row =>
      assert(row.getAs[Double]("jaccard_kmv") ==
        row.getAs[Double]("jaccard_exact"),
        s"sub-k sketch not exact: $row")
    }
    // the one true domain match must outscore every other pair
    val nk = r.find(row => row.getAs[String]("col_a") == "c_nationkey" &&
      row.getAs[String]("col_b") == "s_nationkey").get
    val best = r.map(_.getAs[Double]("jaccard_kmv")).max
    assert(nk.getAs[Double]("jaccard_kmv") == best && best > 0.0,
      s"nationkey pair is not the top match: $nk vs best $best")
    // disjoint-prefix name columns must score 0
    val nm = r.find(row => row.getAs[String]("col_a") == "c_name" &&
      row.getAs[String]("col_b") == "s_name").get
    assert(nm.getAs[Double]("jaccard_kmv") == 0.0)
  }

  test("EM weights: parameters are probabilities with m/u separation") {
    val r = rows("linkage_em_weights").sortBy(_.getAs[Long]("iteration"))
    assert(r.map(_.getAs[Long]("iteration")).toSeq == Seq(1L, 2L, 3L))
    r.foreach { row =>
      Seq("p_match", "m_name", "m_seg", "m_band",
        "u_name", "u_seg", "u_band").foreach { c =>
        val v = row.getAs[Double](c)
        assert(v > 0.0 && v < 1.0, s"$c=$v out of (0,1)")
      }
    }
    val last = r.last
    // the unsupervised fit must recover the m > u separation on every
    // field (the supervised census shows m_f >> u_f), and the class
    // prior must land well below one half — matches are always the
    // minority of blocked pairs (its level tracks block size, so no
    // tighter fixture-independent bound exists)
    Seq("name", "seg", "band").foreach { f =>
      assert(last.getAs[Double](s"m_$f") > last.getAs[Double](s"u_$f"),
        s"EM lost m/u separation on $f: $last")
    }
    assert(last.getAs[Double]("p_match") < 0.5, last.toString)
    // the match-evidence weight on the strongest field must grow as EM
    // sharpens (name agreement is near-deterministic for matches)
    val mn = r.map(_.getAs[Double]("m_name"))
    assert(mn.zip(mn.tail).forall { case (a, b) => b > a }, mn.toSeq)
  }

  test("isotonic fit is monotone and mass-preserving") {
    val r = rows("learn_isotonic_calibration")
      .sortBy(_.getAs[Long]("bucket"))
    assert(r.nonEmpty)
    val iso = r.map(_.getAs[Double]("iso_rate"))
    assert(iso.forall(v => v >= 0.0 && v <= 1.0), iso.toSeq)
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a },
      s"isotonic fit not monotone: ${iso.toSeq}")
    // PAV preserves total mass: sum(iso * n) == sum(pos)
    val fitted = r.map(row =>
      row.getAs[Double]("iso_rate") * row.getAs[Long]("n_docs")).sum
    val pos = r.map(_.getAs[Long]("n_pos")).sum.toDouble
    assert(math.abs(fitted - pos) < 1e-6 * math.max(pos, 1.0),
      s"mass not preserved: fitted=$fitted pos=$pos")
  }

  test("conformal coverage meets the finite-sample guarantee") {
    val Array(r) = rows("learn_conformal_coverage")
    val nCal = r.getAs[Long]("n_cal")
    assert(r.getAs[Long]("k_rank") == ((nCal + 1) * 9 + 9) / 10)
    val q = r.getAs[Long]("q_units")
    assert(q >= 0L && q <= 1000000L)
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0.85 && cov <= 1.0, s"coverage $cov")
    assert(r.getAs[Boolean]("within_slack"))
  }

  test("FD discovery: g3 is a consistent repair cost; keys hold") {
    val r = rows("profile_fd_discovery")
    assert(r.length == 8)
    r.foreach { row =>
      val nRows = row.getAs[Long]("n_rows")
      val g3 = row.getAs[Long]("g3_rows")
      val viol = row.getAs[Long]("n_violating_groups")
      assert(row.getAs[Long]("n_groups") <= nRows)
      assert(viol <= row.getAs[Long]("n_groups"))
      // holds <=> no violating groups <=> zero repair cost
      assert(row.getAs[Boolean]("holds") == (viol == 0))
      assert((g3 == 0) == (viol == 0), s"g3/violations disagree: $row")
      // deleting every row but one per group always repairs an FD
      assert(g3 <= nRows - row.getAs[Long]("n_groups"))
    }
    val by = r.map(row => row.getAs[String]("fd_name") -> row).toMap
    assert(by("order_to_cust").getAs[Boolean]("holds"))
    assert(by("nation_to_region").getAs[Boolean]("holds"))
    assert(by("cust_to_seg").getAs[Boolean]("holds"))
    assert(!by("ocust_to_priority").getAs[Boolean]("holds"))
  }

  test("sorted neighborhood: monotone in w; misses are sort-key noise") {
    val r = rows("linkage_sorted_neighborhood").sortBy(_.getAs[Long]("w"))
    assert(r.map(_.getAs[Long]("w")).toSeq == Seq(3L, 10L))
    val Seq(w3, w10) = r.toSeq
    // a wider window can only add candidates and found pairs
    assert(w10.getAs[Long]("n_candidates") >= w3.getAs[Long]("n_candidates"))
    assert(w10.getAs[Long]("n_true_found") >= w3.getAs[Long]("n_true_found"))
    r.foreach { row =>
      val pc = row.getAs[Double]("pair_completeness")
      val rr = row.getAs[Double]("reduction_ratio")
      // the w·n candidate bound makes rr → 1 as the corpus grows; at
      // the 150-row sf0.001 fixture it is only ~0.93
      assert(pc > 0.0 && pc <= 1.0 && rr > 0.9 && rr < 1.0, s"$row")
      assert(row.getAs[Long]("n_true_found") <= row.getAs[Long]("n_truth"))
      assert(row.getAs[Long]("n_true_found") <=
        row.getAs[Long]("n_candidates"))
    }
    // the characteristic SNM failure: band-noised true pairs sort far
    // apart, so completeness plateaus below 1 instead of rising with w
    assert(w10.getAs[Double]("pair_completeness") < 1.0)
    // the sliding window must plan as an EQUI-join on the target rank
    // (the 1-row totals crossJoin is the only nested-loop allowed)
    val p = SparkEntry.registry("linkage_sorted_neighborhood")
      .fn(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join [gt#"),
      s"SNM window must join on the rank key:\n$p")
  }
}
