package graft

import org.apache.spark.sql.Row

/** Semantic invariants of the round-8 second-wave queries — properties a
  * correct implementation must satisfy REGARDLESS of the fixture, so they
  * complement the DuckDB hash gate (which would also pass if both engines
  * shared the same misconception). Run at sf0.001 for speed.
  */
class RegistryInvariantSpec extends SparkSpec {

  // The registry-wide walks honor GRAFT_AUDIT_SF so the ORDER-BY
  // totality audit can be run one-off at a bigger scale factor (tie
  // witnesses are data-dependent; sf0.001 is the always-on gate,
  // sf0.01 the pre-round deep check).
  private val sf = sys.env.getOrElse("GRAFT_AUDIT_SF",
    "/root/testdata/sf0.001")
  private def rows(name: String): Array[Row] =
    SparkEntry.registry(name).fn(spark, sf).collect()

  test("KM survival curve is a valid product-limit estimate") {
    val r = rows("events_survival_km")
    assert(r.nonEmpty)
    // survival within [0, 1] (exactly 0 when the last at-risk user
    // converts), non-increasing in duration; at-risk counts
    // non-increasing; factors are valid probabilities
    val surv = r.map(_.getAs[Double]("survival"))
    assert(surv.forall(s => s >= 0.0 && s <= 1.0), surv.toSeq)
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a })
    val risk = r.map(_.getAs[Long]("n_at_risk"))
    assert(risk.zip(risk.tail).forall { case (a, b) => b <= a })
    r.foreach { row =>
      val f = row.getAs[Double]("factor")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("HITS scores are positive, ranked, and role-complete") {
    val r = rows("graph_hits_hubs_authorities")
    val byRole = r.groupBy(_.getAs[String]("role"))
    assert(byRole.keySet == Set("authority", "hub"))
    byRole.values.foreach { g =>
      val scores = g.map(_.getAs[Double]("score"))
      assert(scores.forall(s => s > 0.0 && s <= 1.0), scores.toSeq)
      assert(scores.zip(scores.tail).forall { case (a, b) => b <= a })
    }
  }

  test("A/B z-test internals reconcile") {
    val Array(r) = rows("events_ab_test_ztest")
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val (xa, xb) = (r.getAs[Long]("x_a"), r.getAs[Long]("x_b"))
    assert(na > 0 && nb > 0 && xa <= na && xb <= nb)
    val pPool = r.getAs[Double]("p_pool")
    assert(pPool > 0.0 && pPool < 1.0, s"degenerate pooled rate $pPool")
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("per-segment OLS R² lands in [0, 1]") {
    val r = rows("learn_linreg_per_segment")
    assert(r.nonEmpty)
    r.foreach { row =>
      val r2 = row.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12,
        s"segment ${row.getAs[String]("segment")} r2=$r2")
    }
  }

  test("peak concurrency reconciles with the boundary ledger") {
    val r = rows("events_peak_concurrency")
    assert(r.nonEmpty)
    // peaks are at least 1 wherever a session boundary fell, and the
    // total boundary count is even (every start has an end)
    assert(r.forall(_.getAs[Long]("peak") >= 1L))
    assert(r.map(_.getAs[Long]("n_bounds")).sum % 2 == 0)
  }

  test("DAU <= WAU <= MAU on every report day") {
    val r = rows("events_dau_wau_mau")
    assert(r.nonEmpty)
    r.foreach { row =>
      val (dau, wau, mau) = (row.getAs[Long]("dau"),
        row.getAs[Long]("wau"), row.getAs[Long]("mau"))
      assert(dau <= wau && wau <= mau, s"$dau / $wau / $mau")
    }
  }

  test("temporal split is exhaustive and ordered") {
    val r = rows("dataset_temporal_split_embargo")
    val bySplit = r.map(row => row.getAs[String]("split") ->
      (row.getAs[Long]("t_lo_us"), row.getAs[Long]("t_hi_us"))).toMap
    assert(bySplit.keySet == Set("1_train", "2_embargo", "3_test"))
    assert(bySplit("1_train")._2 < bySplit("2_embargo")._1)
    assert(bySplit("2_embargo")._2 < bySplit("3_test")._1)
    // the embargo band spans at most 24h of events
    val (elo, ehi) = bySplit("2_embargo")
    assert(ehi - elo <= 86400000000L)
  }

  test("filtered ANN never returns the query's own label") {
    val r = rows("similarity_filtered_topk")
    assert(r.length == 10)
    val emb = graft.io.Tables.embeddings(spark, sf)
    val qLabel = emb.filter(org.apache.spark.sql.functions.col("vec_id")
      === 0).select("label").head().getInt(0)
    assert(r.forall(_.getAs[Int]("label") != qLabel))
  }

  test("Little's law closes exactly: sweep integral == total duration") {
    val Array(r) = rows("events_littles_law_audit")
    assert(r.getAs[Boolean]("is_consistent"),
      s"integral ${r.getAs[Long]("integral_us")} != " +
        s"durations ${r.getAs[Long]("total_dur_us")}")
    assert(r.getAs[Double]("avg_concurrency") > 0.0)
    // L = λ·W closes up to float op-order (the two W derivations use
    // different operation orders; the INTEGER identity above is the
    // exact check)
    val wl = r.getAs[Double]("w_hours_little")
    val wm = r.getAs[Double]("w_hours_measured")
    assert(math.abs(wl - wm) <= 1e-12 * math.abs(wm), s"$wl vs $wm")
  }

  test("rollup answering is bit-exact for every month") {
    val r = rows("warehouse_rollup_answering")
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Boolean]("rewrite_exact")),
      r.filterNot(_.getAs[Boolean]("rewrite_exact")).toSeq.toString)
  }

  test("publish gate passes a healthy staged delta with evidence") {
    val Array(r) = rows("warehouse_publish_gate")
    // the update delta's null names do NOT survive the COALESCE merge
    // (kept names win), inserts stay within the ±20% drift band, and
    // merge keys stay unique — so the gate reads all-green and says so
    assert(r.getAs[Boolean]("publish"))
    assert(r.getAs[Long]("null_names") == 0)
    assert(r.getAs[Long]("pk_dups") == 0)
    assert(r.getAs[Boolean]("pk_ok") && r.getAs[Boolean]("drift_ok"))
    assert(r.getAs[Long]("n_staged") > r.getAs[Long]("n_base"))
  }

  test("mergeable sketches stay inside their declared error bounds") {
    val Array(u) = rows("sketch_theta_union")
    assert(u.getAs[Boolean]("within_bound"),
      s"union rel_err ${u.getAs[Double]("rel_err")}")
    val Array(i) = rows("sketch_kmv_intersection")
    assert(i.getAs[Boolean]("within_bound"),
      s"intersection rel_err ${i.getAs[Double]("rel_err")}")
  }

  test("Sobel census: flat second rendition matches base edge energy") {
    // rendition 1 is the base raster + a GLOBAL +8 offset; Sobel is a
    // derivative, so both renditions of a doc must report identical
    // gradient energy — a structural invariant of the convolution.
    val r = rows("multimodal_sobel_edge_density")
    val byDoc = r.groupBy(row => row.getAs[Long]("asset_id") / 2)
    byDoc.values.foreach { g =>
      assert(g.length == 2)
      val e = g.map(_.getAs[Long]("sum_grad2")).distinct
      assert(e.length == 1, s"renditions disagree: ${g.toSeq}")
    }
  }

  test("k-anonymity census is monotone in k and internally consistent") {
    val r = rows("warehouse_k_anonymity")
    assert(r.map(_.getAs[Long]("k")).toSeq == Seq(2L, 5L, 10L))
    // the SAME group table is audited at every k, so n_groups is
    // constant; raising k can only put MORE groups/rows at risk
    assert(r.map(_.getAs[Long]("n_groups")).distinct.length == 1)
    val gar = r.map(_.getAs[Long]("groups_at_risk"))
    val rar = r.map(_.getAs[Long]("rows_at_risk"))
    assert(gar.zip(gar.tail).forall { case (a, b) => a <= b }, gar.toSeq)
    assert(rar.zip(rar.tail).forall { case (a, b) => a <= b }, rar.toSeq)
    r.foreach { row =>
      // a group at risk at level k has < k members, and the verdict
      // column is exactly the rows_at_risk == 0 predicate
      assert(row.getAs[Long]("rows_at_risk") <
        row.getAs[Long]("k") * math.max(1L, row.getAs[Long]("groups_at_risk")) ||
        row.getAs[Long]("groups_at_risk") == 0L)
      assert(row.getAs[Boolean]("anonymous") ==
        (row.getAs[Long]("rows_at_risk") == 0L))
    }
  }

  test("DSIR weights are positive and the top slate tilts toward the target slice") {
    val r = rows("corpus_dsir_weights")
    assert(r.length > 0 && r.length <= 20)
    val w = r.map(_.getAs[Double]("weight"))
    assert(w.forall(x => x > 0.0 && !x.isNaN && !x.isInfinite), w.toSeq)
    assert(w.zip(w.tail).forall { case (a, b) => b <= a }, w.toSeq)
    // importance resampling is only doing its job if the top-ranked
    // docs are mostly from (or indistinguishable from) the en target:
    // check their weight exceeds the neutral weight 1.0 — a doc whose
    // token distribution matches the source blend exactly would sit
    // near Π(ratio)=product of ~1 factors
    assert(w.head > w.last)
  }

  test("Bradley-Terry strengths conserve wins and track the win differential") {
    val r = rows("learn_bradley_terry_strength")
    assert(r.length >= 2)
    val wins = r.map(_.getAs[Long]("n_wins"))
    val losses = r.map(_.getAs[Long]("n_losses"))
    // every win is some other item's loss — an exact ledger identity
    assert(wins.sum == losses.sum, s"${wins.sum} != ${losses.sum}")
    val st = r.map(_.getAs[Double]("strength"))
    assert(st.forall(s => s > 0.0 && !s.isNaN && !s.isInfinite), st.toSeq)
    // mean-1 normalization (up to the 2^30 floor-scaling granularity)
    assert(math.abs(st.sum / st.length - 1.0) < 1e-6, st.toSeq)
    // with near-uniform comparison counts the MM fit is monotone in the
    // win differential at the extremes: best net record ⇒ top strength
    val byDiff = r.sortBy(x =>
      x.getAs[Long]("n_wins") - x.getAs[Long]("n_losses"))
    assert(byDiff.last.getAs[Double]("strength") == st.max,
      r.mkString("; "))
    assert(byDiff.head.getAs[Double]("strength") == st.min,
      r.mkString("; "))
  }

  test("Cohen's kappa confusion ledger reconciles") {
    val Array(r) = rows("stat_cohen_kappa")
    val cells = Seq("n11", "n10", "n01", "n00").map(r.getAs[Long])
    assert(cells.sum == r.getAs[Long]("n_docs"))
    assert(cells.forall(_ > 0), cells) // both gates genuinely disagree
    val (po, pe) = (r.getAs[Double]("po"), r.getAs[Double]("pe"))
    assert(po >= 0.0 && po <= 1.0 && pe > 0.0 && pe < 1.0)
    val k = r.getAs[Double]("kappa")
    assert(k == (po - pe) / (1.0 - pe) && k <= 1.0, k)
  }

  test("Mann-Whitney U ledger reconciles across both directions") {
    val Array(r) = rows("stat_mann_whitney_u")
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na > 0 && nb > 0)
    val (ua, ub) = (r.getAs[Double]("u_a"), r.getAs[Double]("u_b"))
    // U_A + U_B = n_a·n_b exactly (every cross pair scores once; the
    // doubled-integer accumulation makes this identity exact in double)
    assert(ua + ub == na.toDouble * nb.toDouble, s"$ua + $ub vs $na*$nb")
    assert(ua >= 0.0 && ub >= 0.0)
    val rb = r.getAs[Double]("rank_biserial")
    assert(rb >= -1.0 && rb <= 1.0, rb)
    assert(rb == ua / (na.toDouble * nb.toDouble) * 2.0 - 1.0)
  }

  test("Kendall tau-b pair ledger reconciles") {
    val Array(r) = rows("stat_kendall_tau")
    val n = r.getAs[Long]("n_items")
    val pairs = r.getAs[Long]("n_pairs")
    assert(pairs == n * (n - 1) / 2)
    val (c, dd) = (r.getAs[Long]("concordant"), r.getAs[Long]("discordant"))
    val (tx, ty) = (r.getAs[Long]("ties_x"), r.getAs[Long]("ties_y"))
    // every pair is concordant, discordant, or tied in >= 1 coordinate
    assert(c + dd <= pairs && c + dd + tx + ty >= pairs,
      s"$c + $dd + $tx + $ty vs $pairs")
    val tau = r.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0 && !tau.isNaN, tau)
  }

  test("Spearman doubled-rank ledger reconciles") {
    val Array(r) = rows("stat_spearman_rho")
    val n = r.getAs[Long]("n")
    assert(n > 0)
    // doubled tie-averaged ranks sum to n(n+1) in EACH coordinate —
    // this holds for any tie structure, so it pins the banded rank
    // construction itself, not just the fixture
    assert(r.getAs[Long]("s_x") == n * (n + 1), r)
    assert(r.getAs[Long]("s_y") == n * (n + 1), r)
    val rho = r.getAs[Double]("rho_spearman")
    assert(rho >= -1.0 && rho <= 1.0 && !rho.isNaN, rho)
  }

  test("CUSUM statistics are non-negative and touch zero on both sides") {
    val r = rows("events_changepoint_cusum")
    assert(r.length > 1)
    val pos = r.map(_.getAs[Long]("cusum_pos"))
    val neg = r.map(_.getAs[Long]("cusum_neg"))
    // S = P - running_min(P) and running_max(P) - P are non-negative by
    // construction, and each hits 0 wherever P touches its own extremum
    // (at least once — the extremum is attained in a finite series)
    assert(pos.forall(_ >= 0L) && neg.forall(_ >= 0L))
    assert(pos.contains(0L) && neg.contains(0L))
    // exact independent re-derivation from the emitted day counts:
    // rebuild P_t = Σ(T·n_j − S) and both running extrema in plain
    // Scala and demand bit-equality — pins the closed-form
    // prefix-minus-extremum identity itself, not just the fixture
    val n = r.map(_.getAs[Long]("n_events"))
    val (t, s) = (n.length.toLong, n.sum)
    var (p, mn, mx) = (0L, 0L, 0L)
    r.zipWithIndex.foreach { case (row, i) =>
      p += t * n(i) - s
      mn = math.min(mn, p); mx = math.max(mx, p)
      assert(row.getAs[Long]("cusum_pos") == p - mn, s"row $i")
      assert(row.getAs[Long]("cusum_neg") == mx - p, s"row $i")
    }
    assert(p == 0L) // the T-scaled deviations telescope to exactly zero
  }

  test("Theil-Sen median pair is a real pair with the exact pair count") {
    val Array(r) = rows("stat_theil_sen")
    val days = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n_pairs") == days * (days - 1) / 2)
    val dx = r.getAs[Long]("med_dx")
    assert(dx >= 1L && dx < days * 2, r) // day gap within the calendar
    assert(r.getAs[Double]("slope_per_day") ==
      r.getAs[Long]("med_dy").toDouble / dx.toDouble, r)
  }

  test("runs-test z-score reconciles exactly with its integer tallies") {
    val Array(r) = rows("stat_runs_test")
    val (a, b) = (r.getAs[Long]("n_above"), r.getAs[Long]("n_below"))
    val runs = r.getAs[Long]("n_runs")
    assert(a > 0 && b > 0, r)
    // with both signs present, runs ∈ [2, n] and the z formula is a
    // pure function of the three emitted integers — recompute it
    assert(runs >= 2 && runs <= a + b, r)
    val (aD, bD) = (a.toDouble, b.toDouble)
    val nD = aD + bD
    val e = 2.0 * aD * bD / nD + 1.0
    val v = (2.0 * aD * bD * (2.0 * aD * bD - nD)) /
      (nD * nD * (nD - 1.0))
    assert(r.getAs[Double]("z_runs") == (runs.toDouble - e) / math.sqrt(v),
      r)
  }

  test("weekday seasonal indices reconcile with their own totals") {
    val r = rows("events_weekday_seasonality")
    assert(r.length == 7)
    assert(r.map(_.getAs[Long]("weekday")).toSeq == (0L to 6L))
    val t = r.map(_.getAs[Long]("n_days")).sum
    val s = r.map(_.getAs[Long]("n_events")).sum
    r.foreach { row =>
      // index_w = (n_w·T)/(c_w·S) exactly, recomputed from the emitted
      // per-weekday tallies and their own totals
      val expect = (row.getAs[Long]("n_events") * t).toDouble /
        (row.getAs[Long]("n_days") * s).toDouble
      assert(row.getAs[Double]("seasonal_index") == expect, row)
    }
  }

  test("Good-Turing table reconciles and discounts hapaxes") {
    val r = rows("text_good_turing")
    assert(r.nonEmpty)
    val rs = r.map(_.getAs[Long]("r"))
    assert(rs.toSeq == rs.sorted.toSeq && rs.distinct.length == rs.length)
    r.foreach { row =>
      val (freq, nr, nx) = (row.getAs[Long]("r"), row.getAs[Long]("n_r"),
        row.getAs[Long]("n_r_next"))
      assert(nr > 0 && nx > 0)
      // r* and the discount are pure functions of the emitted tallies
      val rstar = ((freq + 1) * nx).toDouble / nr.toDouble
      assert(row.getAs[Double]("r_star") == rstar, row)
      assert(row.getAs[Double]("discount") == rstar / freq.toDouble, row)
    }
  }

  test("mutual k-NN pairs are canonical, unique, and cosine-bounded") {
    val r = rows("similarity_mutual_knn")
    assert(r.nonEmpty)
    val pairs = r.map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id")))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
    assert(r.forall { x =>
      val c = x.getAs[Double]("cos"); c >= -1.0000001 && c <= 1.0000001
    })
    // mutuality is strictly more selective than one-directional k-NN:
    // every mutual pair count is bounded by n·k/2 (each side spends one
    // of its k slots on the other)
    val n = rows("similarity_mutual_knn").flatMap(x =>
      Seq(x.getAs[Long]("a_id"), x.getAs[Long]("b_id"))).distinct.length
    assert(r.length <= n * 3 / 2 + 1, s"${r.length} pairs for $n ids")
  }

  test("ANOVA F reconciles with its own sum-of-squares decomposition") {
    val Array(r) = rows("stat_anova_oneway")
    val (k, n) = (r.getAs[Long]("k_groups"), r.getAs[Long]("n"))
    assert(k == 5 && n > k) // the 5 order priorities
    val (ssb, ssw) = (r.getAs[Double]("ss_between"),
      r.getAs[Double]("ss_within"))
    assert(ssw > 0.0 && ssb > 0.0, r)
    // F is a pure function of the emitted components — recompute it
    assert(r.getAs[Double]("f_stat") ==
      (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble), r)
  }

  test("Brown-Forsythe W reconciles with its deviation decomposition") {
    val Array(r) = rows("stat_levene_brown_forsythe")
    val (k, n) = (r.getAs[Long]("k_groups"), r.getAs[Long]("n"))
    assert(k == 5 && n > k)
    val (ssb, ssw) = (r.getAs[Double]("ss_between"),
      r.getAs[Double]("ss_within"))
    assert(ssw > 0.0 && ssb > 0.0, r)
    assert(r.getAs[Double]("w_stat") ==
      (ssb / (k - 1).toDouble) / (ssw / (n - k).toDouble), r)
  }

  test("Cramér's V reconciles with chi-square and stays in [0, 1]") {
    val Array(r) = rows("stat_cramers_v")
    val (nr, nc) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_cols"))
    assert(nr == 5 && nc == 5) // segment and priority domains
    val n = r.getAs[Long]("n")
    val chi2 = r.getAs[Double]("chi2")
    assert(n > 0 && chi2 >= 0.0, r)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0, v)
    assert(v == math.sqrt(
      chi2 / (n.toDouble * (math.min(nr, nc) - 1).toDouble)), r)
  }

  test("McNemar cells partition the corpus and the statistic reconciles") {
    val Array(r) = rows("stat_mcnemar_quality_gates")
    val cells = Seq("n11", "n10", "n01", "n00").map(r.getAs[Long])
    assert(cells.sum == r.getAs[Long]("n_docs"))
    val (b, c) = (r.getAs[Long]("n10"), r.getAs[Long]("n01"))
    // the test is only meaningful with live discordance — the fixture
    // has it on both sides (gate A over-admits long docs, gate B
    // over-admits stopword-dense ones)
    assert(b > 0 && c > 0, cells)
    val (bD, cD) = (b.toDouble, c.toDouble)
    assert(r.getAs[Double]("mcnemar_chi2") ==
      (bD - cD) * (bD - cD) / (bD + cD), r)
  }

  test("Q-Q deciles are monotone order statistics with exact ratios") {
    val r = rows("stat_qq_deciles")
    assert(r.length == 9)
    assert(r.map(_.getAs[Long]("q")).toSeq == (1L to 9L))
    // each column is a sequence of order statistics at increasing
    // ranks — monotone by construction
    val bs = r.map(_.getAs[Long]("building_cents"))
    val ms = r.map(_.getAs[Long]("machinery_cents"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a <= b }, bs.toSeq)
    assert(ms.zip(ms.tail).forall { case (a, b) => a <= b }, ms.toSeq)
    assert(bs.head > 0 && ms.head > 0)
    r.foreach { row =>
      assert(row.getAs[Double]("qq_ratio") ==
        row.getAs[Long]("building_cents").toDouble /
          row.getAs[Long]("machinery_cents").toDouble, row)
    }
  }

  test("log-rank statistic reconciles with its hypergeometric moments") {
    val Array(r) = rows("events_logrank_ab")
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na > 0 && nb > 0)
    val oa = r.getAs[Long]("o_a")
    assert(oa >= 0 && oa <= na) // arm A can't see more deaths than users
    val (ea, va) = (r.getAs[Double]("e_a"), r.getAs[Double]("v_a"))
    assert(ea > 0.0 && va > 0.0, r)
    // under any assignment, E[O_a] stays within the total death count
    assert(ea <= (na + nb).toDouble, r)
    assert(r.getAs[Double]("logrank_chi2") ==
      (oa.toDouble - ea) * (oa.toDouble - ea) / va, r)
  }

  test("Cochran's Q ledger reconciles and the statistic recomputes") {
    val Array(r) = rows("stat_cochran_q")
    val gs = Seq("g_len", "g_stop", "g_quality").map(r.getAs[Long])
    val (sl, sl2) = (r.getAs[Long]("sum_l"), r.getAs[Long]("sum_l2"))
    // ΣL_i is exactly the sum of the per-gate admit totals, and with
    // L ∈ {0..3}: ΣL ≤ ΣL² ≤ 3ΣL
    assert(gs.sum == sl, s"${gs.sum} != $sl")
    assert(sl <= sl2 && sl2 <= 3 * sl, (sl, sl2))
    assert(gs.forall(g => g > 0 && g < r.getAs[Long]("n_docs")), gs)
    val sumG2 = gs.map(_.toDouble).map(g => g * g)
    val q = 2.0 * (3.0 * (sumG2(0) + sumG2(1) + sumG2(2)) -
      sl.toDouble * sl.toDouble) / (3.0 * sl.toDouble - sl2.toDouble)
    assert(r.getAs[Double]("cochran_q") == q, r)
    assert(q >= 0.0, q)
  }

  test("declared output schemas use only hash-safe primitive types") {
    // The driver hash-compares RENDERED values, so a declared output
    // column may only use a type whose rendering is proven identical
    // across Spark and DuckDB. DecimalType is the documented offender
    // (rendered 75770369206 vs DuckDB's 75770369206.0 — the exact
    // failure customer_abc_classes and incremental_join_maintenance hit
    // in rounds 7-8; decimals stay INSIDE plans, the final select casts
    // to BIGINT/DOUBLE). The rest of the allowlist is the closed set
    // every one of the 342 green queries already uses — notably NO
    // timestamps (events queries cast to string/date for output), no
    // floats, no binary, no nested types. Extending the set requires a
    // demonstrated rendering-parity argument, not just a green local
    // run.
    import org.apache.spark.sql.types._
    val allowed: Set[DataType] = Set(LongType, IntegerType, DoubleType,
      StringType, BooleanType, DateType)
    val offenders = SparkEntry.registry.toSeq.sortBy(_._1).flatMap {
      case (name, spec) =>
        spec.fn(spark, sf).schema.fields.collect {
          case f if !allowed.contains(f.dataType) =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      s"output type outside the proven-rendering allowlist " +
        s"(cast in the final select of BOTH engines, or prove parity " +
        s"and extend the list): ${offenders.mkString(", ")}")
  }

  test("every multi-row result's ORDER BY is a total order (no tie-ambiguity)") {
    // Tie-ambiguity is the likeliest future hash flake: if two DISTINCT
    // rows compare equal under a query's final ORDER BY, Spark and
    // DuckDB may legally emit them in different orders and the driver's
    // row-order-sensitive hash splits while rows/schema still match.
    // For every declared query: peel Project/Limit/Offset wrappers off
    // the analyzed plan to the final Sort, evaluate (sort key, emitted
    // row) pairs, and assert no key group holds more than one distinct
    // emitted row. A query with NO final Sort must be provably
    // single-row. Runs on sf0.001 — ambiguity is a plan property, but
    // it needs data to witness; the fixture carries duplicate natural
    // keys by design, so collisions that can happen, do.
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.NamedExpression
    import org.apache.spark.sql.graftshim.Shim
    import org.apache.spark.sql.functions._

    def peel(p: LogicalPlan, projs: List[Seq[NamedExpression]])
        : (LogicalPlan, List[Seq[NamedExpression]]) = p match {
      case Project(l, c) => peel(c, l :: projs) // ends innermost-first
      case GlobalLimit(_, c) => peel(c, projs)
      case LocalLimit(_, c) => peel(c, projs)
      case Offset(_, c) => peel(c, projs)
      case s: SubqueryAlias => peel(s.child, projs)
      case other => (other, projs)
    }

    val problems = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.registry.toSeq.sortBy(_._1).foreach { case (name, spec) =>
      val df = spec.fn(spark, sf)
      // SQL-frontend plans root at WithCTE; the Sort sits in the body.
      // Keep the defs so the Sort child (which references the CTEs via
      // CTERelationRef) stays evaluable when re-wrapped below.
      val (cteDefs, body) = df.queryExecution.analyzed match {
        case w: WithCTE => (w.cteDefs, w.plan)
        case p => (Seq.empty[CTERelationDef], p)
      }
      if (name == "events_stream_state_inspection") {
        // localCheckpoint truncates the plan to a LogicalRDD, so the
        // Sort is invisible — attest the contract directly instead:
        // rows strictly increase on user_id (per-group state key, so
        // unique ⇒ the emitted order is total).
        val ids = df.collect().map(_.getAs[Long]("user_id"))
        assert(ids.zip(ids.tail).forall { case (a, b) => a < b },
          s"$name must emit strictly increasing unique user_id")
      } else if (name == "recursive_cte_hierarchy") {
        // Same localCheckpoint truncation (the recursion-row conf must
        // be live at execution, so the query runs eagerly inside its
        // conf window): attest directly — max_depth is the GROUP BY
        // key of the final ORDER BY max_depth, so the emitted rows
        // must strictly increase on it (unique ⇒ total order).
        val ds = df.collect().map(_.getAs[Int]("max_depth"))
        assert(ds.nonEmpty && ds.zip(ds.tail).forall {
          case (a, b) => a < b },
          s"$name must emit strictly increasing unique max_depth")
      } else peel(body, Nil) match {
        case (s: Sort, projs) =>
          val childPlan =
            if (cteDefs.isEmpty) s.child else WithCTE(s.child, cteDefs)
          val keyed = Shim.ofRows(spark, childPlan).withColumn("__sortkey",
            struct(s.order.map(o => Shim.column(o.child)): _*))
          // re-apply the projections sitting above the Sort so ties are
          // judged on the EMITTED columns (ties among identical emitted
          // rows are harmless; a dropped tiebreaker column is not)
          val emitted = projs.foldLeft(keyed) { (acc, list) =>
            acc.select(list.map(Shim.column(_)) :+ col("__sortkey"): _*)
          }
          val outCols = emitted.columns.filterNot(_ == "__sortkey")
          val Array(worst, total) = emitted.groupBy("__sortkey")
            .agg(countDistinct(struct(outCols.map(col): _*)).as("d"),
              count(lit(1)).as("n"))
            .agg(coalesce(max("d"), lit(0L)), coalesce(sum("n"), lit(0L)))
            .head.toSeq.map(_.asInstanceOf[Long]).toArray
          if (worst > 1)
            problems += s"$name: ORDER BY admits $worst distinct rows " +
              "in one tie group"
          // the driver's hash is row-order-sensitive on BOTH engines: a
          // multi-row result whose ORACLE text lacks a final ORDER BY
          // leaves DuckDB free to emit any order even when the Spark
          // side sorts (all current no-ORDER-BY oracles are 1-row)
          if (total > 1 && spec.oracle.exists(o =>
              !o.toLowerCase.contains("order by")))
            problems += s"$name: multi-row result but the DuckDB oracle " +
              "has no ORDER BY"
        case _ =>
          if (df.count() > 1)
            problems += s"$name: multi-row result without a final ORDER BY"
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("no oracle exits a summed DECIMAL directly as DOUBLE without headroom proof") {
    // The r12 exit-conversion class, promoted from a one-time audit to a
    // standing gate: DuckDB v1.0.0's direct DECIMAL→DOUBLE cast
    // double-rounds ~25% of values whose scaled magnitude passes 2^53
    // (scripts/canary_exits.py pins the measurement), so a summed-money
    // exit `CAST(SUM(..DECIMAL..) AS DOUBLE)` hash-drifts from Spark as
    // soon as the corpus grows the sum past 2^53 scaled units. Safe
    // exits: integer cents BIGINT (preferred), split-integer, or
    // via-VARCHAR (`CAST(CAST(x AS VARCHAR) AS DOUBLE)` — a single
    // correctly-rounded conversion on both engines). This walk finds
    // every CAST(expr AS DOUBLE) in every oracle whose expr sums a
    // MONEY/fact-value DECIMAL without a VARCHAR hop — the sums that
    // grow with the corpus. Two shapes are excluded by construction:
    // floor(x·2^k) scaled-integer sums (their safety is the
    // constructive scale rule — the scale is chosen so the SUM cannot
    // cross 2^53, audited by the `bound:` walk below and, for the
    // adaptive cases, derived from the census size on both engines),
    // and sums over non-fact columns (counts, ranks, weights), which
    // are bounded by their own domains. Each remaining hit must sit in
    // the explicit allowlist, which exists only for exits with a
    // MEASURED magnitude bound under 2^53 at the deep-scale fixture.
    // Measure the CONVERSION SITE, not the output column: a mean-shaped
    // oracle (`CAST(SUM(..) AS DOUBLE) / n`) converts the SUM before
    // dividing, so its site magnitude is output x n — the .sf2hot sweep
    // caught stat_bootstrap_ci drifting through exactly this gap (output
    // 2.5e5 looked 36000x safe; the sum site was 7.5e17, past 2^53).
    val moneyCols = Seq("o_totalprice", "l_extendedprice", "c_acctbal",
      "l_quantity", "l_discount", "value", "volume", "rev", "s_acctbal",
      "p_retailprice")
    val asDouble = "(?i)AS\\s+DOUBLE\\s*\\)".r
    // The argument span of every SUM( in `e` that is NOT floor-shaped.
    // Floor-shaped means the sum's argument, after an optional cast
    // wrapper, is floor(...) — the constructive scaled-integer rule
    // (scale chosen so the SUM cannot cross 2^53, audited by the
    // `bound:` walk below). r13-advice tightening: a floor() ANYWHERE in
    // the cast expr used to exempt the whole site, so a money sum merely
    // COMBINED with an unrelated floor() bypassed the gate; now only the
    // floor-wrapping-the-sum shape is exempt, judged per sum span.
    // floor-shaped = the WHOLE argument is floor(...) or
    // cast(floor(...) as <type>) — paren-matched, not prefix-matched:
    // a prefix test would also exempt SUM(floor(x) + <money>), the
    // exact bypass class this gate exists for (r14 review finding)
    def floorShaped(arg0: String): Boolean = {
      val arg = arg0.trim
      "^(cast\\s*\\(\\s*)?floor\\s*\\(".r.findPrefixMatchOf(arg) match {
        case None => false
        case Some(pm) =>
          var depth = 1
          var i = pm.end
          while (i < arg.length && depth > 0) {
            arg(i) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
            }
            i += 1
          }
          val tail = arg.substring(i).trim
          if (pm.group(1) == null) tail.isEmpty
          else tail.matches("(?s)as\\s+\\w+\\s*(\\([^)]*\\))?\\s*\\)")
      }
    }
    def bareSumSpans(e: String): Seq[String] =
      "sum\\s*\\(".r.findAllMatchIn(e).toSeq.flatMap { sm =>
        var depth = 1
        var i = sm.end
        while (i < e.length && depth > 0) {
          e(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        val arg = e.substring(sm.end, math.max(sm.end, i - 1)).trim
        if (floorShaped(arg)) None else Some(arg)
      }
    def hits(sql: String): Seq[String] = {
      asDouble.findAllMatchIn(sql).toSeq.flatMap { m =>
        // scan backward from the AS-DOUBLE keyword to the CAST's opening
        // paren (depth −1), capturing the cast's inner expression
        var depth = 0
        var i = m.start - 1
        while (i >= 0 && depth >= 0) {
          sql(i) match {
            case ')' => depth += 1
            case '(' => depth -= 1
            case _ =>
          }
          i -= 1
        }
        val expr = sql.substring(i + 2, m.start).toLowerCase
        val unsafe = !expr.contains("as varchar") &&
          bareSumSpans(expr).exists(a =>
            a.contains("decimal") && moneyCols.exists(a.contains))
        if (unsafe) Some(expr.replaceAll("\\s+", " ").trim.take(90))
        else None
      }
    }
    // Allowlisted exits: measured at the .sf1 deep-scale fixture
    // (max |double output column| x 10^scale vs 2^53 ≈ 9.0e15) with
    // >= 100x headroom — i.e. safe past ~sf100 on a linear growth law,
    // and most are per-group/per-window sums that grow far slower.
    // Every OTHER summed-DECIMAL money exit must convert (the r13 walk
    // found nine below the bar and hardened them via VARCHAR, including
    // sql_pipe_syntax at 0.6x — already past 2^53 at sf1, green only by
    // DuckDB's 75%-per-value luck). A new query that trips this gate:
    // measure its exit at .sf1 (scripts: the canary method), then either
    // convert the exit or add an entry HERE with the measured number.
    // r13-advice tightening: the headroom is a NUMBER the gate checks
    // (>= 100x), not free prose, and a stale entry — one whose query no
    // longer trips the detector — fails the gate too, so the list can
    // only ever name live, measured exits. Infinity = an exit that is
    // exact by construction (integer BIGINT units: int64->double is a
    // single correctly-rounded conversion on both engines up to 2^63).
    val allowlist: Map[String, (Double, String)] = Map(
      "agg_pricing_summary" ->
        (655d, "sum_qty at .sf1 (sum_base_price via VARCHAR)"),
      "customer_rfm_segments" -> (1637d, "per-customer sums at .sf1"),
      "events_attribution_last_touch" ->
        (4235d, "per-user value sums at .sf1"),
      "events_gap_fill" -> (4.5e7, "per-day sums at .sf1"),
      "events_ses_forecast" -> (5096d, "per-day sums at .sf1"),
      "events_session_window" -> (2.7e7, "per-session sums at .sf1"),
      "events_sliding_hour" -> (89051d, "per-window sums at .sf1"),
      "events_stream_append_windows" ->
        (259288d, "per-window sums at .sf1"),
      "events_stream_attribution" -> (4235d, "per-user sums at .sf1"),
      "events_stream_batch_sink" -> (898d, "per-type sums at .sf1"),
      "events_stream_restart_recovery" ->
        (2.1e6, "per-window sums at .sf1"),
      "events_stream_sliding_windows" ->
        (259288d, "per-window sums at .sf1"),
      "events_tumbling_hour" -> (259288d, "per-window sums at .sf1"),
      "events_tumbling_streaming" -> (259288d, "per-window sums at .sf1"),
      "events_window_range_1h" ->
        (2.7e7, "per-row range window at .sf1"),
      "feature_scale_per_segment" ->
        (Double.PositiveInfinity,
          "exits via exact-BIGINT u-units, exact to 2^63"),
      "partitioned_dpp_join_prune" ->
        (3588d, "DECIMAL(25,2): scale x100 not x1e6, at .sf1"),
      "salted_aggregation" -> (176d, "per-flag quantity sums at .sf1"),
      "scalar_subquery_ratio" -> (3.2e9, "ratio output at .sf1"),
      "sql_frontend_cbo_stats_chain" ->
        (290d, "per-flag quantity sums at .sf1"),
      "sql_frontend_group_order_all" ->
        (352d, "per-group quantity sums at .sf1"),
      "sql_frontend_q10" -> (17181d, "per-customer revenue at .sf1"),
      "sql_frontend_q17" -> (324d, "brand-filtered sums at .sf1"),
      "sql_frontend_q18" -> (18019d, "per-order quantity sums at .sf1"),
      "sql_frontend_q22" -> (3842d, "per-prefix balance sums at .sf1"),
      "sql_frontend_q3" -> (9798d, "per-order revenue at .sf1"),
      "sql_frontend_q7" -> (117d, "nation-pair-year revenue at .sf1"),
      "sql_frontend_q8" -> (2.4e11, "market-share ratio at .sf1"),
      "window_running_sum" ->
        (570871d, "per-supplier running sums at .sf1"))
    val thin = allowlist.filter(_._2._1 < 100).keys.toSeq.sorted
    assert(thin.isEmpty, "allowlisted exits below the 100x headroom " +
      "bar (convert them instead): " + thin.mkString(", "))
    val tripped = scala.collection.mutable.Set[String]()
    val offenders = SparkEntry.registry.toSeq.sortBy(_._1).flatMap {
      case (name, spec) => spec.oracle.toSeq.flatMap(hits).flatMap { h =>
        if (allowlist.contains(name)) { tripped += name; None }
        else Some(s"$name: $h")
      }
    }
    assert(offenders.isEmpty,
      "summed-DECIMAL exits cast directly to DOUBLE (convert to " +
        "cents-BIGINT / split-integer / via-VARCHAR, or allowlist with " +
        "a measured headroom bound):\n" + offenders.mkString("\n"))
    val stale = (allowlist.keySet -- tripped).toSeq.sorted
    assert(stale.isEmpty, "allowlist entries whose query no longer " +
      "trips the detector (remove them — a dead entry could silently " +
      "cover a future regression): " + stale.mkString(", "))
  }

  test("every scaled .toLong in main source carries a documented bound") {
    // floor(x * 2^k).toLong (and math.round, which also lands in Long)
    // silently clamp at Long.MaxValue once x escapes its assumed range —
    // the hazard class the round-9 EM fix (LinkageQ exact-BigInt M-step)
    // removed dynamically. This audit makes the remaining sites' safety
    // arguments STATIC: every driver-side `math.floor(...).toLong` /
    // `math.round(...)` in non-test source must carry an explicit
    // `bound:` marker proving the scaled value fits in a Long — and the
    // marker must be the NEAREST comment block above the site (or
    // inline on the site's own statement), so an unrelated bound
    // comment a few lines up cannot satisfy a newly added unbounded
    // site by accident (r10 advice). `.toLong` is matched on the
    // 4-line joined statement, so a wrapped floor whose cast lands two
    // or three lines later no longer escapes detection.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    def isCommentLine(s: String): Boolean = {
      val t = s.trim
      t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
    }
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).flatMap { p =>
        val lines = java.nio.file.Files.readAllLines(p).asScala
        // the nearest comment block above line i (skipping at most 8
        // code lines of wrapped statement) contains a `bound:` marker;
        // an inline marker anywhere on the site's own 4-line joined
        // statement also counts. A code line holding ANOTHER
        // floor/round site between this site and the comment block
        // breaks adjacency — the block proves THAT site, and stacked
        // unbounded sites must not inherit a neighbor's marker.
        def isSiteLine(s: String): Boolean =
          s.contains("math.floor(") || s.contains("math.round(")
        def boundAdjacent(i: Int): Boolean = {
          // forward: inline trailing marker on the wrapped statement's
          // own code lines only — a PURE comment line ends the
          // statement and belongs to whatever follows it
          val fwd = lines.slice(i, math.min(lines.size, i + 4))
            .takeWhile(!isCommentLine(_))
          if (fwd.exists(_.contains("bound:"))) return true
          var j = i - 1
          val lo = math.max(0, i - 8)
          while (j >= lo && !isCommentLine(lines(j))) {
            if (isSiteLine(lines(j))) return false
            j -= 1
          }
          if (j < lo || j < 0) return false
          var k = j
          while (k - 1 >= 0 && isCommentLine(lines(k - 1))) k -= 1
          lines.slice(k, j + 1).exists(_.contains("bound:"))
        }
        lines.zipWithIndex.collect {
          case (l, i) if {
            val joined = lines.slice(i, math.min(lines.size, i + 4))
              .mkString(" ")
            val isSite =
              (l.contains("math.floor(") && joined.contains(".toLong")) ||
                l.contains("math.round(")
            isSite && !boundAdjacent(i)
          } => s"$p:${i + 1}: ${l.trim}"
        }
      }.toSeq
    assert(offenders.isEmpty,
      "scaled Long-producing site without a documented overflow bound " +
        "(add a `// bound:` comment proving the range):\n" +
        offenders.mkString("\n"))
  }
}
