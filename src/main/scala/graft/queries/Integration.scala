package graft.queries

import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.etl.{Conform, Identity}
import graft.io.Tables

/** E1/E2 parity on harness tables: the full entity-integration dataflow and
  * the profiling report, each as ONE declared query. */
object Integration {

  val registry: Map[String, QuerySpec] = Map(

    // E1 — the reference's import pipeline shape (insert.py:87-166) over
    // harness data: conform two sources into person/company "entities"
    // (customers ~ contacts, suppliers ~ contracts feed), derive entity
    // type from null patterns, mint deterministic ids, union, dedup by
    // natural key. One shuffle (the dedup), exactly like etl.Pipeline.
    "entity_integration" -> QuerySpec(
      (s, d) => {
        val contacts = Tables.customer(s, d).select(
          col("c_name").as("name"),
          nullif(col("c_mktsegment"), lit("MACHINERY")).as("first_name"),
          nullif(col("c_nationkey"), lit(3)).cast("string").as("birthday"))
        val contracts = Tables.supplier(s, d).select(
          col("s_name").as("name"),
          nullif(col("s_name"), col("s_name")).as("first_name"), // all-null
          nullif(col("s_nationkey"), col("s_nationkey")).cast("string").as("birthday"))
        val unioned = contacts.unionByName(contracts)
          .withColumn("entity_type",
            Conform.entityType(col("first_name"), col("birthday")))
          .withColumn("entity_id", Identity.surrogateId(
            col("name"), col("first_name"), col("birthday"), col("entity_type")))
        unioned.dropDuplicates("entity_id")
          .select("entity_id", "name", "first_name", "birthday", "entity_type")
          .orderBy("entity_id")
      },
      """WITH contacts AS (
        |  SELECT c_name AS name,
        |         NULLIF(c_mktsegment, 'MACHINERY') AS first_name,
        |         CAST(NULLIF(c_nationkey, 3) AS VARCHAR) AS birthday
        |  FROM customer),
        |contracts AS (
        |  SELECT s_name AS name, CAST(NULL AS VARCHAR) AS first_name,
        |         CAST(NULL AS VARCHAR) AS birthday
        |  FROM supplier),
        |unioned AS (SELECT * FROM contacts UNION ALL SELECT * FROM contracts),
        |typed AS (
        |  SELECT *, CASE WHEN first_name IS NULL AND birthday IS NULL
        |                 THEN 'PM' ELSE 'PF' END AS entity_type
        |  FROM unioned),
        |keyed AS (
        |  SELECT sha256(concat_ws(chr(1),
        |           coalesce(name, chr(0)), coalesce(first_name, chr(0)),
        |           coalesce(birthday, chr(0)), entity_type)) AS entity_id,
        |         name, first_name, birthday, entity_type,
        |         row_number() OVER (PARTITION BY sha256(concat_ws(chr(1),
        |           coalesce(name, chr(0)), coalesce(first_name, chr(0)),
        |           coalesce(birthday, chr(0)), entity_type))
        |           ORDER BY name) AS rn
        |  FROM typed)
        |SELECT entity_id, name, first_name, birthday, entity_type
        |FROM keyed WHERE rn = 1 ORDER BY entity_id""".stripMargin),

    // Generic one-pass column profiler applied to supplier: per column
    // null count, distinct cardinality, min/max (string-rendered).
    "profile_table_generic" -> QuerySpec(
      (s, d) => graft.profile.Quality.profileTable(Tables.supplier(s, d))
        .orderBy("column"),
      {
        val cols = Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        cols.map { c =>
          s"""SELECT '$c' AS "column",
             |  COUNT(CASE WHEN $c IS NULL THEN 1 END) AS nulls,
             |  COUNT(DISTINCT $c) AS n_distinct,
             |  CAST(MIN($c) AS VARCHAR) AS min_value,
             |  CAST(MAX($c) AS VARCHAR) AS max_value FROM supplier""".stripMargin
        }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")
      }),

    // E2 — the reference's profiling report (data_analysis.py:5-98) as one
    // long-format result: metric name → value. Null audit, row counts,
    // duplicate audits under both pandas keep-semantics, distinct
    // cardinalities, and the cross-source semi-join match count.
    "profile_report" -> QuerySpec(
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        def metric(name: String, v: org.apache.spark.sql.Column,
                   df: org.apache.spark.sql.DataFrame) =
          df.agg(v.cast("long").as("value")).select(lit(name).as("metric"), col("value"))
        val parts = Seq(
          metric("customer_rows", count(lit(1)), c),
          metric("orders_rows", count(lit(1)), o),
          metric("null_segment_count",
            count(when(nullif(col("c_mktsegment"), lit("BUILDING")).isNull, 1)), c),
          metric("distinct_priorities", countDistinct(col("o_orderpriority")), o))
        val dupFalse = graft.profile.Quality
          .duplicateRowsKeepFalse(li, Seq("l_orderkey"))
          .select(lit("lineitem_dup_rows_keep_false").as("metric"),
            col("dup_rows").as("value"))
        val dupFirst = graft.profile.Quality
          .duplicateRowsKeepFirst(li, Seq("l_orderkey", "l_suppkey"))
          .select(lit("lineitem_dup_rows_keep_first").as("metric"),
            col("dup_rows").as("value"))
        val semi = c.join(o.select(col("o_custkey").as("c_custkey")),
            Seq("c_custkey"), "left_semi")
          .agg(count(lit(1)).as("value"))
          .select(lit("customers_with_orders").as("metric"), col("value"))
        (parts :+ dupFalse :+ dupFirst :+ semi)
          .reduce(_ unionByName _)
          .orderBy("metric")
      },
      """SELECT * FROM (
        |  SELECT 'customer_rows' AS metric, COUNT(*) AS value FROM customer
        |  UNION ALL SELECT 'orders_rows', COUNT(*) FROM orders
        |  UNION ALL SELECT 'null_segment_count',
        |    COUNT(CASE WHEN NULLIF(c_mktsegment, 'BUILDING') IS NULL THEN 1 END)
        |    FROM customer
        |  UNION ALL SELECT 'distinct_priorities',
        |    COUNT(DISTINCT o_orderpriority) FROM orders
        |  UNION ALL SELECT 'lineitem_dup_rows_keep_false',
        |    CAST(COALESCE(SUM(cnt), 0) AS BIGINT) FROM
        |    (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey
        |     HAVING COUNT(*) > 1)
        |  UNION ALL SELECT 'lineitem_dup_rows_keep_first',
        |    CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) FROM
        |    (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey, l_suppkey)
        |  UNION ALL SELECT 'customers_with_orders', COUNT(*) FROM customer c
        |    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |) ORDER BY metric""".stripMargin),

    // E3 — the LLM corpus-prep dataflow as ONE declared query, composing
    // four verified operators end to end: quality gate → exact dedup
    // (keep min doc_id per bag-of-words fingerprint) → sliding-window
    // chunking → per-source yield statistics. The threshold comparison is
    // safe across engines because the quality doubles themselves
    // hash-match (text_quality_score), so >= 0.6 selects identical rows.
    // Plan shape: one window shuffle for the dedup, one explode for
    // chunking, one final aggregation — the whole corpus passes through
    // exactly once.
    "corpus_prep_pipeline" -> QuerySpec(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val scored = Tables.documents(s, d)
          .withColumn("quality",
            graft.ext.TextOps.qualityScore(col("text")))
          .filter(col("quality") >= 0.6)
        val w = Window.partitionBy("fp").orderBy("doc_id")
        val deduped = scored
          .withColumn("fp", graft.ext.TextOps.bowFingerprint(col("text")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val chunks = deduped
          .select(col("source"), col("doc_id"),
            graft.ext.TextOps.tokens(col("text")).as("toks"))
          .select(col("source"), col("doc_id"), col("toks"),
            explode(sequence(lit(0), size(col("toks")) - 1, lit(25)))
              .as("start"))
          .select(col("source"), col("doc_id"),
            size(slice(col("toks"), col("start") + 1, lit(50)))
              .as("chunk_toks"))
        chunks.groupBy("source")
          .agg(countDistinct("doc_id").as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum("chunk_toks").cast("long").as("total_tokens"))
          .orderBy("source")
      },
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |         string_split(trim(text), ' ') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, source, toks,
        |    least(1.0, CAST(len(toks) AS DOUBLE)/100.0)*0.4
        |    + (CAST(len(list_filter(toks, x -> x IN ('the','a','of','and')))
        |         AS DOUBLE) / len(toks))*0.3
        |    + (1.0 - CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
        |         / length(text))*0.2
        |    + (1.0 - CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE)
        |         / length(text))*0.1 AS quality,
        |    md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
        |  FROM t),
        |q AS (SELECT * FROM c WHERE quality >= 0.6),
        |dd AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id)
        |      AS rn FROM q) WHERE rn = 1),
        |ch AS (
        |  SELECT source, doc_id, len(toks[start + 1 : start + 50]) AS chunk_toks
        |  FROM (SELECT source, doc_id, toks,
        |          unnest(range(0, len(toks), 25)) AS start FROM dd))
        |SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |       CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |       CAST(SUM(chunk_toks) AS BIGINT) AS total_tokens
        |FROM ch GROUP BY source ORDER BY source""".stripMargin),

    // Curation FUNNEL observability — the per-stage yield report every
    // production corpus build publishes: how many documents (and tokens)
    // survive each successive gate. Stages: ingest → language filter
    // (metadata lang = 'en') → Gopher-style quality (30-90 tokens, zero
    // intra-doc duplicate 3-grams) → exact dedup (first doc per
    // bag-of-words fingerprint among quality survivors) → near-dup prune
    // (drop any doc with a SMALLER-id quality-surviving partner at
    // verified shingle-jaccard ≥ 0.5, via the shared LSH pair stage —
    // chain-consistent with the min-canonical cluster rule). The narrow
    // per-doc feature table (id, lang, n_tokens, dup3, fp) is
    // materialized ONCE and the five stage censuses aggregate over it;
    // the only non-scan work is the fingerprint window and one
    // anti-join against the pair list. Integer-only output.
    "corpus_curation_funnel" -> QuerySpec(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val toks = graft.ext.TextOps.tokens(col("text"))
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(toks).cast("long").as("n_tokens"),
            (greatest(size(toks) - 2, lit(0)).cast("long") -
              size(array_distinct(graft.ext.Dedup.shingles3(toks)))
                .cast("long")).as("dup3"),
            graft.ext.TextOps.bowFingerprint(col("text")).as("fp"))
          .localCheckpoint(true)
        val s1 = base.filter(col("lang") === "en")
        val s2 = s1.filter(col("n_tokens").between(30, 90) &&
          col("dup3") === 0)
        val s3 = s2.withColumn("rn", row_number().over(
            Window.partitionBy("fp").orderBy("doc_id")))
          .filter(col("rn") === 1).drop("rn")
        val partners = DedupQ.lshVerifiedPairs(s, d)
          .filter(col("jaccard") >= 0.5)
          .join(s3.select(col("doc_id").as("id_a")), "id_a")
          .select(col("id_b").as("doc_id")).distinct()
        val s4 = s3.join(partners, Seq("doc_id"), "left_anti")
        def census(idx: Int, name: String,
                   df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_docs"),
              coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
            .select(lit(idx.toLong).as("stage_idx"), lit(name).as("stage"),
              col("n_docs"), col("n_tokens"))
        census(0, "ingest", base)
          .unionAll(census(1, "lang_en", s1))
          .unionAll(census(2, "quality", s2))
          .unionAll(census(3, "exact_dedup", s3))
          .unionAll(census(4, "near_dedup", s4))
          .orderBy("stage_idx")
      },
      s"""WITH ${DedupQ.duckVerifiedCtes},
         |b AS (SELECT doc_id, lang,
         |        CAST(len(string_split(trim(text), ' ')) AS BIGINT)
         |          AS n_tokens,
         |        CAST(greatest(len(string_split(trim(text), ' ')) - 2, 0)
         |          - len(list_distinct(list_transform(
         |              range(1, len(string_split(trim(text), ' ')) - 1),
         |              i -> string_split(trim(text), ' ')[i] || ' ' ||
         |                   string_split(trim(text), ' ')[i+1] || ' ' ||
         |                   string_split(trim(text), ' ')[i+2])))
         |          AS BIGINT) AS dup3,
         |        md5(array_to_string(list_sort(list_distinct(
         |          string_split(trim(text), ' '))), ' ')) AS fp
         |      FROM documents),
         |s1 AS (SELECT * FROM b WHERE lang = 'en'),
         |s2 AS (SELECT * FROM s1
         |       WHERE n_tokens BETWEEN 30 AND 90 AND dup3 = 0),
         |s3 AS (SELECT * FROM (
         |         SELECT *, row_number() OVER (PARTITION BY fp
         |           ORDER BY doc_id) AS rn FROM s2) WHERE rn = 1),
         |prt AS (SELECT DISTINCT v.id_b AS doc_id
         |        FROM verified v JOIN s3 a ON v.id_a = a.doc_id
         |        WHERE v.jaccard >= 0.5),
         |s4 AS (SELECT s3.* FROM s3
         |       WHERE doc_id NOT IN (SELECT doc_id FROM prt))
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_idx, 'ingest' AS stage,
         |         COUNT(*) AS n_docs,
         |         CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens
         |  FROM b
         |  UNION ALL SELECT 1, 'lang_en', COUNT(*),
         |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s1
         |  UNION ALL SELECT 2, 'quality', COUNT(*),
         |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s2
         |  UNION ALL SELECT 3, 'exact_dedup', COUNT(*),
         |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s3
         |  UNION ALL SELECT 4, 'near_dedup', COUNT(*),
         |    CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM s4)
         |ORDER BY stage_idx""".stripMargin)
  )
}
