package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The tiled fixture scale-up is library surface (the deep-scale stress
  * probes run against its output), so its contract is pinned:
  * cardinalities scale by the tile count, surrogate keys stay unique,
  * referential integrity holds, value marginals are preserved exactly,
  * tile 0 is byte-identical to the base corpus, and the whole build is
  * deterministic (no RNG anywhere). */
class GenScaleSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"
  private val tiles = 2

  private lazy val out: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-genscale-spec").toString
    GenScale.generate(spark, base, dir, tiles)
    dir
  }

  private def rd(d: String, t: String) =
    spark.read.parquet(s"$d/$t.parquet")

  test("every scaled table's cardinality is tiles x base; dims copied") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      assert(rd(out, t).count() == tiles * rd(base, t).count(), t)
    }
    for (t <- Seq("region", "nation"))
      assert(rd(out, t).count() == rd(base, t).count(), t)
  }

  test("surrogate keys stay unique and referential integrity holds") {
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "part" -> "p_partkey", "events" -> "event_id",
        "documents" -> "doc_id", "embeddings" -> "vec_id")) {
      val df = rd(out, t)
      assert(df.count() == df.select(k).distinct().count(),
        s"$t.$k not unique after tiling")
    }
    val orphans = rd(out, "lineitem").as("l")
      .join(rd(out, "orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"), "left_anti")
      .count()
    assert(orphans == 0, s"$orphans lineitem rows lost their order")
    val partOrphans = rd(out, "lineitem").as("l")
      .join(rd(out, "part").as("p"),
        col("l.l_partkey") === col("p.p_partkey"), "left_anti")
      .count()
    assert(partOrphans == 0, s"$partOrphans lineitem rows lost their part")
    // user_id is a FK into customer (events_stream_enrich joins
    // user_id = c_custkey): tile t's events must reference tile t's
    // customers, not drift out of key range
    val userOrphans = rd(out, "events").as("e")
      .join(rd(out, "customer").as("c"),
        col("e.user_id") === col("c.c_custkey"), "left_anti")
      .count()
    assert(userOrphans == 0, s"$userOrphans events lost their customer")
    // vec_id is an FK into documents (every embedding query joins
    // vec_id = doc_id): tile t's embeddings must reference tile t's
    // documents — the base has fewer embeddings than documents, so a
    // vecB-shifted build would scramble this association
    val vecOrphans = rd(out, "embeddings").as("v")
      .join(rd(out, "documents").as("dd"),
        col("v.vec_id") === col("dd.doc_id"), "left_anti")
      .count()
    assert(vecOrphans == 0, s"$vecOrphans embeddings lost their document")
  }

  test("value marginals are preserved exactly (every literal filter still selects the same fraction)") {
    val b = rd(base, "orders").groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = rd(out, "orders").groupBy("o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s == b.map { case (k, v) => k -> v * tiles })
    // per-order group sizes (items/order) are preserved per tile
    val gb = rd(base, "lineitem").groupBy("l_orderkey").count()
      .groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gs = rd(out, "lineitem").groupBy("l_orderkey").count()
      .groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gs == gb.map { case (k, v) => k -> v * tiles })
  }

  test("tile 0 documents are byte-identical; other tiles are near-dups with consistent n_chars") {
    val baseTexts = rd(base, "documents").select("doc_id", "text")
    val maxBase = baseTexts.agg(max("doc_id")).head.getLong(0)
    val tile0 = rd(out, "documents")
      .filter(col("doc_id") <= maxBase) // tile-0 keys = base keys
      .select("doc_id", "text")
    // tile-0 ids equal base ids, so an exact anti-join must be empty
    val diff = tile0.except(baseTexts).count() +
      baseTexts.except(tile0).count()
    assert(diff == 0, "tile 0 must be byte-identical to the base corpus")
    val badLen = rd(out, "documents")
      .filter(length(col("text")).cast("long") =!= col("n_chars")).count()
    assert(badLen == 0, "n_chars must equal length(text) on every tile")
  }

  test("--skew preserves cardinality, PK uniqueness, and referential integrity while growing hot keys superlinearly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-genscale-skew").toString
    GenScale.generate(spark, base, dir, tiles, skew = true)
    // same row counts as uniform tiling — skew moves references, not rows
    for (t <- Seq("orders", "lineitem", "events"))
      assert(rd(dir, t).count() == tiles * rd(base, t).count(), t)
    // primary keys never fold
    for ((t, k) <- Seq("orders" -> "o_orderkey", "events" -> "event_id")) {
      val df = rd(dir, t)
      assert(df.count() == df.select(k).distinct().count(),
        s"$t.$k not unique under --skew")
    }
    // every folded FK still resolves (its tile-0 target exists)
    for ((ft, fk, dt, dk) <- Seq(
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("events", "user_id", "customer", "c_custkey"),
        ("embeddings", "vec_id", "documents", "doc_id"))) {
      val orphans = rd(dir, ft).as("f")
        .join(rd(dir, dt).as("d"),
          col(s"f.$fk") === col(s"d.$dk"), "left_anti").count()
      assert(orphans == 0, s"$orphans $ft rows lost their $dt under --skew")
    }
    // the head actually grows: tile-0 (= base-key) customers receive
    // MORE orders than the base corpus gave them (folded references),
    // whereas the uniform tiling keeps their count exactly at base
    val custB = rd(base, "customer")
      .agg(max("c_custkey")).head.getLong(0) + 1L
    val baseOrders = rd(base, "orders").count()
    val hotOrders = rd(dir, "orders")
      .filter(col("o_custkey") < custB).count()
    assert(hotOrders > baseOrders,
      s"skew mode must fold orders onto tile-0 customers " +
        s"(hot=$hotOrders base=$baseOrders)")
    val hotUniform = rd(out, "orders")
      .filter(col("o_custkey") < custB).count()
    assert(hotUniform == baseOrders,
      "uniform tiling must keep tile-0 reference counts at base")
  }

  test("--hot concentrates a dominating head key while keeping every FK resolvable") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-genscale-hot").toString
    GenScale.generate(spark, base, dir, tiles, skew = true,
      hotPermille = 300)
    // rows and PKs are untouched — --hot only re-routes references
    for (t <- Seq("orders", "lineitem", "events"))
      assert(rd(dir, t).count() == tiles * rd(base, t).count(), t)
    for ((t, k) <- Seq("orders" -> "o_orderkey", "events" -> "event_id")) {
      val df = rd(dir, t)
      assert(df.count() == df.select(k).distinct().count(),
        s"$t.$k not unique under --hot")
    }
    // referential integrity still holds (the head key exists in tile 0)
    for ((ft, fk, dt, dk) <- Seq(
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("events", "user_id", "customer", "c_custkey"))) {
      val orphans = rd(dir, ft).as("f")
        .join(rd(dir, dt).as("d"),
          col(s"f.$fk") === col(s"d.$dk"), "left_anti").count()
      assert(orphans == 0, s"$orphans $ft rows lost their $dt under --hot")
    }
    // the head key dominates: at permille=300 over 2 tiles the minimum
    // base customer should carry ~15% of all orders (300/1000 of the
    // single non-zero tile) — demand >10%, the AQE-mandatory regime,
    // and demand it EXCEEDS every other customer's count
    val custH = rd(base, "customer").agg(min("c_custkey")).head.getLong(0)
    val total = rd(dir, "orders").count()
    val byCust = rd(dir, "orders").groupBy("o_custkey").count()
    val headN = byCust.filter(col("o_custkey") === custH)
      .head.getLong(1)
    assert(headN.toDouble / total > 0.10,
      s"head key carries only ${headN.toDouble / total} of orders")
    val maxN = byCust.agg(max("count")).head.getLong(0)
    assert(maxN == headN, "the --hot head key must be the hottest key")
  }

  test("the build is deterministic: a second generation produces identical data") {
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft-genscale-spec2").toString
    GenScale.generate(spark, base, dir2, tiles)
    for (t <- Seq("lineitem", "documents", "embeddings")) {
      val a = rd(out, t)
      val b = rd(dir2, t)
      assert(a.except(b).count() == 0 && b.except(a).count() == 0,
        s"$t differs between two identical generations")
    }
  }
}
