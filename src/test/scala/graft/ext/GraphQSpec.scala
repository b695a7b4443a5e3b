package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic checks for the link-analysis pack (graph_pagerank_copurchase).
  * The oracle already proves bit-exact parity; these assert the MATH is
  * PageRank: probability mass conservation and hub dominance. */
class GraphQSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pagerank distributes ~unit mass and ranks the hub first") {
    // Star graph: node 0 co-occurs with everyone, leaves only with 0.
    // Symmetric edge list with degrees, exactly the query's edge shape.
    import spark.implicits._
    val leaves = (1L to 6L)
    val edges = (leaves.map(l => (0L, l, 6L)) ++ leaves.map(l => (l, 0L, 1L)))
      .toDF("src", "dst", "deg")
    val nodes = (0L +: leaves).toDF("node")
    val n = 7
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to 5)
      ranks = graft.queries.GraphQ.pagerankRound(edges, nodes, ranks, 0.15 / n)
        .localCheckpoint(true)
    val rows = ranks.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val total = rows.values.sum
    // teleport 0.15 + damped mass 0.85 (minus ~2^-48-scale truncation)
    assert(math.abs(total - 1.0) < 1e-9, s"mass not conserved: $total")
    val hub = rows(0L)
    leaves.foreach(l => assert(hub > rows(l), s"hub $hub <= leaf ${rows(l)}"))
    // leaves are symmetric: identical rank, bit-exact (same fold inputs)
    assert(leaves.map(rows).distinct.size == 1, "asymmetric leaf ranks")
  }

  test("triangle count: K4 has 4 triangles, star has 0, orientation is a DAG") {
    import spark.implicits._
    // K4 (complete graph on 4 nodes): C(4,3) = 4 triangles, cc = 1.
    val k4 = (for {
      a <- 0L to 3L; b <- 0L to 3L if a != b
    } yield (a, b)).toDF("src", "dst")
    val deg4 = k4.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val o4 = graft.queries.GraphQ.orientEdges(k4, deg4)
    // orientation keeps each undirected edge exactly once
    assert(o4.count() == 6)
    assert(o4.select("src", "dst").distinct().count() == 6)
    val tri4 = graft.queries.GraphQ.triangleCount(o4).head().getLong(0)
    assert(tri4 == 4L, s"K4 triangles: $tri4")
    // Star graph: hub 0 with 5 leaves — wedges but zero triangles.
    val leaves = (1L to 5L)
    val star = (leaves.map(l => (0L, l)) ++ leaves.map(l => (l, 0L)))
      .toDF("src", "dst")
    val degS = star.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val oS = graft.queries.GraphQ.orientEdges(star, degS)
    val triS = graft.queries.GraphQ.triangleCount(oS).head().getLong(0)
    assert(triS == 0L, s"star triangles: $triS")
  }

  test("declared triangle census matches hand-checkable invariants at sf0.001") {
    val r = graft.queries.GraphQ.registry("graph_triangle_census")
      .fn(spark, sf).head()
    val (nodes, edges, tri, wedges, cc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(nodes > 0 && edges > 0 && tri > 0)
    assert(wedges >= tri * 3, "each triangle closes 3 wedges")
    assert(cc > 0.0 && cc <= 1.0)
    assert(math.abs(cc - 3.0 * tri / wedges) == 0.0)
  }

  test("declared pagerank query returns 20 ranked parts at sf0.001") {
    val out = graft.queries.GraphQ.registry("graph_pagerank_copurchase")
      .fn(spark, sf).collect()
    assert(out.length == 20)
    val prs = out.map(_.getDouble(1))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b },
      "not sorted by pr desc")
    assert(prs.forall(p => p > 0 && p < 1))
  }
}
