package graft.queries

import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.io.Tables
import graft.profile.Quality

/** Relational operator pack: scans, filters, projections, aggregations,
  * joins, set ops, sorts — the SURVEY.md §2.1-2.8 inventory expressed over
  * the harness tables with DuckDB oracles.
  *
  * Conventions:
  *  - every multi-row query ends in ORDER BY (both sides) for hash parity;
  *  - count-like results are BIGINT on both sides (Spark `count`, DuckDB
  *    `COUNT`/`CAST(... AS BIGINT)` — DuckDB `SUM(int)` is HUGEINT, so sums
  *    of counts are always cast);
  *  - double aggregates go through exact DECIMAL(25,6) sums and are cast
  *    back to DOUBLE, so accumulation order cannot change the hash.
  */
object Relational {

  /** Exact, order-independent sum of a double column (see class doc). */
  private def dsum(c: String) =
    sum(col(c).cast("decimal(25,6)")).cast("double")

  val registry: Map[String, QuerySpec] = Map(

    // A1 — per-column null counts, one pass (data_analysis.py:14,19,24).
    // Harness data has no nulls, so nulls are derived via NULLIF to make
    // the counts non-trivial.
    "null_counts" -> QuerySpec(
      (s, d) => {
        val base = Tables.customer(s, d).select(
          nullif(col("c_mktsegment"), lit("HOUSEHOLD")).as("seg"),
          nullif(col("c_nationkey"), lit(7)).as("nat"),
          col("c_name").as("name"))
        Quality.nullCounts(base)
      },
      """SELECT COUNT(CASE WHEN NULLIF(c_mktsegment,'HOUSEHOLD') IS NULL THEN 1 END) AS seg,
        |       COUNT(CASE WHEN NULLIF(c_nationkey,7) IS NULL THEN 1 END) AS nat,
        |       COUNT(CASE WHEN c_name IS NULL THEN 1 END) AS name
        |FROM customer""".stripMargin),

    // A2 — distinct values (data_analysis.py:47,58,81).
    "distinct_priority" -> QuerySpec(
      (s, d) => Quality.distinctValues(Tables.orders(s, d), "o_orderpriority")
        .orderBy("o_orderpriority"),
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority"),

    // A3 — row count (data_analysis.py:53-54,64,75,91).
    "count_lineitem" -> QuerySpec(
      (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("n")),
      "SELECT COUNT(*) AS n FROM lineitem"),

    // A5 — duplicate audit, pandas keep=False semantics
    // (data_analysis.py:56-57,67-69): count every member of a >1 group.
    "dup_audit_keep_false" -> QuerySpec(
      (s, d) => Quality.duplicateRowsKeepFalse(Tables.lineitem(s, d), Seq("l_orderkey")),
      """SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS dup_rows
        |FROM (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1)""".stripMargin),

    // A6 — duplicate audit, pandas keep='first' semantics
    // (data_analysis.py:66,77-79): all-but-first of each group.
    "dup_audit_keep_first" -> QuerySpec(
      (s, d) => Quality.duplicateRowsKeepFirst(Tables.lineitem(s, d), Seq("l_orderkey", "l_suppkey")),
      """SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS dup_rows
        |FROM (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey, l_suppkey)""".stripMargin),

    // J1/A7 — the reference's O(n*m) probe loop (data_analysis.py:86-94)
    // as a LEFT SEMI join; right side broadcast (orders keys are small
    // relative to a 100 TB fact side — broadcast kills the shuffle).
    "semi_join_customers_with_orders" -> QuerySpec(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
        Quality.semiJoinCount(c, o, Seq("c_custkey"))
      },
      """SELECT COUNT(*) AS n_matched FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin),

    // Anti join — NOT EXISTS complement of J1. The right side is filtered
    // to high-value orders so the anti side is non-empty at every SF.
    "anti_join_customers_without_orders" -> QuerySpec(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
          .filter(col("o_totalprice") > 450000.0)
          .select(col("o_custkey").as("c_custkey"))
        c.join(o, Seq("c_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin),

    // J2 — inner equi-join + residual filter + projection (tests.py:39-41
    // shape). Customer side is the small dim → broadcast hash join.
    "join_orders_customers" -> QuerySpec(
      (s, d) => {
        val o = Tables.orders(s, d)
        val c = broadcast(Tables.customer(s, d))
        o.join(c, o("o_custkey") === c("c_custkey"))
          .filter(col("c_mktsegment") === "BUILDING" &&
                  col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin),

    // TPC-H Q1-flavored grouped aggregation: the canonical scan → partial
    // agg → final agg shape; exact decimal sums for hash-stable doubles.
    "agg_pricing_summary" -> QuerySpec(
      // (r15: a conditional fan-out before this agg was tried and
      // REVERTED — 3 plain decimal sums are too cheap to amortize the
      // added exchange: 0.94 s -> 1.12 s measured. See OPTIMIZATION_r15.)
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          (dsum("l_discount") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
        |       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6)))
        |            AS VARCHAR) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // U1 — vertical union keeping duplicates (insert.py:128-129 =
    // pd.concat = UNION ALL), then a stable ORDER BY.
    "union_all_entities" -> QuerySpec(
      (s, d) => {
        val a = Tables.customer(s, d).select(col("c_name").as("name"), lit("customer").as("src"))
        val b = Tables.supplier(s, d).select(col("s_name").as("name"), lit("supplier").as("src"))
        a.unionByName(b).orderBy("src", "name")
      },
      """SELECT * FROM (
        |  SELECT c_name AS name, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_name AS name, 'supplier' AS src FROM supplier
        |) ORDER BY src, name""".stripMargin),

    // O — top-k by sort (ORDER BY ... LIMIT): Spark plans TakeOrderedAndProject,
    // which is a per-partition heap + driver merge — no full sort at scale.
    "topk_orders_by_price" -> QuerySpec(
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).limit(10),
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin),

    // TPC-H Q14 shape: class-share of revenue in one ship month —
    // lineitem ⋈ part with a month predicate pushed to the fact scan,
    // conditional + total revenue in one aggregation pass (exact decimal
    // sums; final ratio in double with the same op order both sides).
    "promo_revenue_share" -> QuerySpec(
      (s, d) => {
        val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(25,6)")
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= "1996-01-01" &&
            col("l_shipdate") < "1996-02-01")
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "ECONOMY", rev)
              .otherwise(lit(0).cast("decimal(25,6)"))).cast("double")
              .as("economy_rev"),
            sum(rev).cast("double").as("total_rev"))
          .select(col("economy_rev"), col("total_rev"),
            (col("economy_rev") / col("total_rev")).as("economy_share"))
      },
      """WITH j AS (
        |  SELECT p_type,
        |         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-02-01'),
        |a AS (
        |  SELECT CAST(CAST(SUM(CASE WHEN p_type = 'ECONOMY' THEN rev
        |                       ELSE CAST(0 AS DECIMAL(25,6)) END)
        |              AS VARCHAR) AS DOUBLE) AS economy_rev,
        |         CAST(CAST(SUM(rev) AS VARCHAR) AS DOUBLE) AS total_rev
        |  FROM j)
        |SELECT economy_rev, total_rev,
        |       economy_rev / total_rev AS economy_share FROM a""".stripMargin)
  )
}
