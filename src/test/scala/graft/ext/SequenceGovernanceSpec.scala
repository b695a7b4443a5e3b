package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the sequence-pattern (CEP) query and the
  * governed-release wave (bitemporal, DP noise, l-diversity) plus the
  * integer-exact batch perceptron. The DuckDB oracle proves cross-engine
  * parity; these prove the MATH is the named mechanism — independent
  * recomputations from first principles, not replays of the query code. */
class SequenceGovernanceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("CEP pattern counts match an independent Java-regex replay") {
    val out = graft.queries.Events.registry("events_pattern_match_cep")
      .fn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val Seq(n, np, nbb, run, nd) = Seq("n_events", "n_purchases",
        "n_browse_buy", "max_browse_run", "n_direct_buy")
        .map(c => r.getLong(r.fieldIndex(c)))
      assert(nbb + nd == np && nbb >= 0 && nd >= 0, s"split: $r")
      assert(run <= n && np <= n, s"bounds: $r")
    }
    // Replay three users end-to-end: rebuild the code string from the raw
    // table in Scala, count with java.util.regex (the independent
    // implementation), compare all five columns.
    val raw = graft.io.Tables.events(spark, sf)
      .filter(col("user_id") < 3)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.map(_._2).sortBy(t => (t._1, t._2, t._3))
          .map(_._3.head).mkString
      }
    val byUser = out.filter(_.getLong(0) < 3)
      .map(r => r.getLong(0) -> r).toMap
    raw.foreach { case (u, seq) =>
      val r = byUser(u)
      def count(pat: String) =
        pat.r.findAllIn(seq).length.toLong
      assert(r.getLong(r.fieldIndex("n_events")) == seq.length.toLong)
      assert(r.getLong(r.fieldIndex("n_purchases")) == seq.count(_ == 'p'))
      assert(r.getLong(r.fieldIndex("n_browse_buy")) == count("[vc]+p"),
        s"user $u seq $seq")
      val runs = "[vc]+".r.findAllIn(seq).map(_.length).toSeq
      assert(r.getLong(r.fieldIndex("max_browse_run")) ==
        (if (runs.isEmpty) 0L else runs.max.toLong))
    }
  }

  test("DP noise is the exact inverse-CDF of the alpha=1/2 geometric") {
    val rows = graft.queries.Warehouse
      .registry("warehouse_dp_noisy_release").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(nTrue, u, noise, rel) = Seq("n_true", "u", "noise",
        "n_released").map(c => r.getLong(r.fieldIndex(c)))
      assert(u >= 0 && u < (1L << 20), s"u out of grid: $r")
      assert(noise >= -16 && noise <= 16, s"clip: $r")
      assert(rel == math.max(nTrue + noise, 0L), s"post-process: $r")
      // Independent inversion, no floor()ed thresholds: k is the smallest
      // j with u+1 <= 2^20*CDF(j), checked as exact BigInt inequalities
      // (j <= -1: 2^(21+j) >= 3(u+1); j >= 0: 2^20(3*2^j - 1) >= 3*2^j(u+1)).
      val k = (-16 to 16).find { j =>
        if (j == 16) true
        else if (j < 0) (BigInt(1) << (21 + j)) >= BigInt(3) * (u + 1)
        else (BigInt(1) << 20) * (BigInt(3) * (BigInt(1) << j) - 1) >=
          (BigInt(3) << j) * BigInt(u + 1)
      }.get
      assert(noise == k.toLong, s"u=$u engine=$noise independent=$k")
    }
  }

  test("perceptron round 1 is the exact all-misclassified update") {
    val out = graft.queries.LearnQ.registry("learn_perceptron_batch")
      .fn(spark, sf).collect().sortBy(_.getLong(0))
    assert(out.length == 4)
    // w0 = 0 makes every train margin 0 (<= 0): round 1 must report the
    // full train split as mistakes and w1 = sum of y*x over it — recompute
    // that sum directly from the table.
    val toks = TextOps.tokens(col("text"))
    val exp = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 =!= 0)
      .select(when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
        size(toks).cast("long").as("x1"), col("n_chars").as("x2"),
        size(filter(toks, t => t === "the")).cast("long").as("x3"))
      .agg(sum(col("y") * col("x1")), sum(col("y") * col("x2")),
        sum(col("y") * col("x3")), sum(col("y")), count(lit(1)))
      .head()
    val r1 = out.head
    assert(r1.getLong(r1.fieldIndex("n_mis")) == exp.getLong(4))
    Seq("w1", "w2", "w3", "b").zipWithIndex.foreach { case (c, i) =>
      assert(r1.getLong(r1.fieldIndex(c)) == exp.getLong(i), s"$c: $r1")
    }
  }

  test("bitemporal scenarios cover the same valid population") {
    val rows = graft.queries.Warehouse
      .registry("warehouse_bitemporal_asof").fn(spark, sf).collect()
    val byScen = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getLong(2)).toMap)
      .toMap
    assert(byScen.keySet == Set("as_reported", "restated"))
    // Every order valid on V has SOME version recorded by both T's, so the
    // scenario totals must both equal |orders with od <= V| — transaction
    // time moves counts BETWEEN statuses, never in or out.
    val expected = graft.io.Tables.orders(spark, sf)
      .filter(col("o_orderdate").cast("date") <= lit("1995-07-01"))
      .count()
    byScen.foreach { case (s0, m) =>
      assert(m.values.sum == expected, s"$s0 total ${m.values.sum}")
    }
    // Later knowledge can only RESOLVE pending orders, never create them.
    assert(byScen("restated").getOrElse("PENDING", 0L) <=
      byScen("as_reported").getOrElse("PENDING", 0L))
  }

  test("l-diversity census is monotone in l and matches a direct count") {
    val rows = graft.queries.Warehouse.registry("warehouse_l_diversity")
      .fn(spark, sf).collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    assert(rows.map(_.getLong(1)).distinct.length == 1, "n_groups varies")
    assert(rows.map(_.getLong(2)).toSeq == rows.map(_.getLong(2)).sorted.toSeq)
    assert(rows.map(_.getLong(3)).toSeq == rows.map(_.getLong(3)).sorted.toSeq)
    val direct = graft.io.Tables.customer(spark, sf)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("b"))
      .agg(count(lit(1)).as("sz"),
        countDistinct(col("c_mktsegment")).as("nd"))
      .filter(col("nd") < 2).agg(coalesce(sum("sz"), lit(0L))).head.getLong(0)
    assert(rows.head.getLong(3) == direct, s"l=2 rows_exposed")
  }

  test("position-based attribution conserves exactly 1M ppm per journey") {
    val rows = graft.queries.Events
      .registry("events_attribution_position_based").fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalPpm = rows.map(r => r.getLong(r.fieldIndex("credit_ppm_total"))).sum
    // Independent journey count: per user, touches between consecutive
    // purchases form one journey iff a purchase closes them — recompute
    // from the raw table in Scala.
    val ev = graft.io.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val nJourneys = ev.groupBy(_._1).values.map { rows0 =>
      val ordered = rows0.sortBy(t => (t._2, t._3))
      var cumP = 0
      var touchSegs = Set.empty[Int]
      var purchaseSegs = Set.empty[Int]
      ordered.foreach { t =>
        if (t._4 == "purchase") { cumP += 1; purchaseSegs += cumP }
        else if (t._4 == "view" || t._4 == "click") touchSegs += cumP + 1
      }
      (touchSegs intersect purchaseSegs).size
    }.sum
    assert(totalPpm == 1000000L * nJourneys,
      s"credit $totalPpm != 1M x $nJourneys journeys")
    val positions = rows.map(_.getString(1)).toSet
    assert(positions.subsetOf(Set("solo", "first", "middle", "last")))
  }

  test("CF leave-one-out rank matches a brute-force replay") {
    val out = graft.queries.LearnQ.registry("learn_cf_eval_topk")
      .fn(spark, sf).collect()
    assert(out.length == 50)
    out.foreach { r =>
      val rank = r.getLong(r.fieldIndex("rank_held"))
      val hit = r.getBoolean(r.fieldIndex("hit_at_10"))
      assert(rank >= 0 && hit == (rank >= 1 && rank <= 10), s"$r")
    }
    // Brute-force the first three eval baskets from the raw pair table.
    val li = graft.io.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val evalOks = baskets.filter(_._2.size >= 3).keys.toSeq.sorted.take(50)
    evalOks.take(3).foreach { eok =>
      val items = baskets(eok)
      val held = items.max
      val ctxSet = items - held
      // score(cand) = Σ_b |ctx ∩ b| over baskets containing cand (the
      // a.pk ≠ b.pk exclusion only affects context members, which are
      // dropped from the candidate set below anyway)
      val scores = scala.collection.mutable.Map.empty[Long, Long]
      baskets.values.foreach { b =>
        val k = ctxSet.count(b)
        if (k > 0) b.foreach(c => scores(c) = scores.getOrElse(c, 0L) + k)
      }
      val adj = scores.filterNot(kv => ctxSet(kv._1))
        .map { case (c, s0) =>
          c -> (if (c == held) s0 - ctxSet.size else s0) }
        .filter(_._2 > 0)
      val ranked = adj.toSeq.sortBy { case (c, s0) => (-s0, c) }
      val expRank = ranked.indexWhere(_._1 == held) match {
        case -1 => 0L
        case i => (i + 1).toLong
      }
      val row = out.find(_.getLong(0) == eok).get
      assert(row.getLong(row.fieldIndex("rank_held")) == expRank,
        s"basket $eok: engine ${row} vs brute $expRank")
    }
  }

  test("bootstrap CI brackets the estimate; the point mean is exact") {
    val r = graft.queries.Analytic.registry("stat_bootstrap_ci")
      .fn(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    def d(c: String) = row.getDouble(row.fieldIndex(c))
    assert(row.getLong(row.fieldIndex("n_resamples")) == 64L)
    assert(d("ci_lo") < d("ci_hi"))
    assert(d("ci_width") == d("ci_hi") - d("ci_lo"))
    // the bootstrap distribution centers on the sample statistic — both
    // the replicate-mean average and the point estimate sit inside the CI
    assert(d("ci_lo") <= d("boot_mean") && d("boot_mean") <= d("ci_hi"))
    assert(d("ci_lo") <= d("point_mean") && d("point_mean") <= d("ci_hi"))
    // the point estimate must be the exact decimal-sum mean of the table
    val exp = graft.io.Tables.orders(spark, sf).agg(
      (sum(col("o_totalprice").cast("decimal(25,6)")).cast("double") /
        count(lit(1)).cast("double")).as("m")).head.getDouble(0)
    assert(d("point_mean") == exp, s"${d("point_mean")} != $exp")
  }

  test("Holt-Winters fold matches an independent Scala replay bit-exactly") {
    val r = graft.queries.Events.registry("events_forecast_holt_winters")
      .fn(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    def d(c: String) = row.getDouble(row.fieldIndex(c))
    // independent daily series from the raw table
    val daily = graft.io.Tables.eventsWithTs(spark, sf)
      .select(to_date(col("ts_utc")).as("day")).groupBy("day")
      .agg(count(lit(1)).as("y")).collect()
      .map(x => x.getDate(0).toLocalDate -> x.getLong(1).toDouble).toMap
    val d0 = daily.keys.min(Ordering.by((_: java.time.LocalDate).toEpochDay))
    val d1 = daily.keys.max(Ordering.by((_: java.time.LocalDate).toEpochDay))
    val ys = Iterator.iterate(d0)(_.plusDays(1))
      .takeWhile(!_.isAfter(d1)).map(daily.getOrElse(_, 0.0)).toArray
    assert(row.getLong(row.fieldIndex("n_days")) == ys.length.toLong)
    assert(ys.length >= 15, "fixture must span >= 15 days")
    // replay the exact fold: same init, same operation order
    val lvl0 = ys.take(7).foldLeft(0.0)(_ + _) / 7.0
    val tr0 = (ys.slice(7, 14).foldLeft(0.0)(_ + _) / 7.0 - lvl0) / 7.0
    var level = lvl0; var trend = tr0
    var s7 = (0 until 7).map(i => ys(i) - lvl0).toVector
    var sumAbs = 0.0; var n = 0.0
    ys.drop(7).foreach { yv =>
      val sOld = s7.head
      val nl = 0.5 * (yv - sOld) + 0.5 * (level + trend)
      val nt = 0.25 * (nl - level) + 0.75 * trend
      val ns = 0.25 * (yv - nl) + 0.75 * sOld
      sumAbs += math.abs(yv - (level + trend + sOld)); n += 1.0
      level = nl; trend = nt; s7 = s7.tail :+ ns
    }
    assert(d("level") == level, s"level ${d("level")} != $level")
    assert(d("trend") == trend, s"trend ${d("trend")} != $trend")
    assert(d("mae_one_step") == sumAbs / n)
    (1 to 7).foreach { h =>
      val exp = level + h.toDouble * trend + s7(h - 1)
      assert(d(s"f$h") == exp, s"f$h ${d(s"f$h")} != $exp")
    }
  }
}
