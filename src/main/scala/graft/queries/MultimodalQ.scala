package graft.queries

import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ext.Multimodal
import graft.io.Tables

/** Multimodal pack: binary-column plumbing over the stubbed asset table.
  * The corpus is pure ASCII (verified: max code point 121), so byte-level
  * oracles can be phrased over character codes in DuckDB. */
object MultimodalQ {

  val registry: Map[String, QuerySpec] = Map(

    // Binary payload stats + a deterministic content digest.
    "multimodal_byte_stats" -> QuerySpec(
      (s, d) => {
        val assets = Multimodal.assetTable(Tables.documents(s, d))
        assets.select(col("asset_id"),
            Multimodal.byteLength(col("bytes")).as("n_bytes"),
            hex(substring(col("bytes"), 1, 16)).as("head_hex"),
            md5(col("bytes")).as("digest"),
            ceil(Multimodal.byteLength(col("bytes")) / 256.0).cast("long")
              .as("n_frames"))
          .orderBy("asset_id")
      },
      """SELECT doc_id AS asset_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       hex(encode(substring(text, 1, 16))) AS head_hex,
        |       md5(text) AS digest,
        |       CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_frames
        |FROM documents ORDER BY asset_id""".stripMargin),

    // The codegen'd native-expression histogram (16 bins over byte values).
    "multimodal_byte_histogram" -> QuerySpec(
      (s, d) => {
        val assets = Multimodal.assetTable(Tables.documents(s, d))
        assets.select(col("asset_id"),
            // String rendering: the driver's checker can't hash array cells.
            array_join(transform(
              Multimodal.byteHistogram(col("bytes"), 16), _.cast("string")),
              ",").as("hist"))
          .orderBy("asset_id")
      },
      """SELECT doc_id AS asset_id,
        |       array_to_string(list_transform(range(0, 16), k -> CAST(
        |         len(list_filter(list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |           c -> ascii(c)), v -> v // 16 = k)) AS VARCHAR)), ',') AS hist
        |FROM documents ORDER BY asset_id""".stripMargin),

    // Binary asset near-dup detection by CHUNK-HASH overlap — the
    // re-upload/copy catcher for opaque payloads (no text semantics
    // assumed): each asset's bytes are cut into fixed 64-byte chunks,
    // chunks are hashed with the portable 60-bit digest, and a pair is a
    // near-dup when the shared-chunk containment |A∩B|/|A| reaches 0.5.
    // Fixed-size chunking is deliberately byte-shift brittle (an insert
    // breaks all downstream chunk boundaries — production upgrades to
    // content-defined chunking, same dataflow); byte-identical and
    // tail-appended copies are caught exactly. Plan shape mirrors the
    // text LSH stage: per-row chunk arrays, hot-chunk cap (a 64-byte run
    // shared by > 50 assets carries no identity signal), DISTINCT
    // candidate pairs from ONE equi-join on the chunk key, exact verify
    // via the sorted-merge intersect over the (sorted, distinct) chunk
    // arrays — never an all-pairs join on payloads.
    "multimodal_chunk_dedup" -> QuerySpec(
      (s, d) => {
        val cap = 50
        val assets = Multimodal.assetTable(Tables.documents(s, d))
        val nchunks = ceil(Multimodal.byteLength(col("bytes")) / 64.0)
          .cast("long")
        val chunkHash = (i: org.apache.spark.sql.Column) =>
          graft.ext.TextOps.hash64(
            substr(col("bytes"), (i * 64 + 1).cast("int"), lit(64)))
        val sets = assets.select(col("asset_id"),
            sort_array(array_distinct(transform(
              sequence(lit(0L), greatest(nchunks - 1, lit(0L))),
              chunkHash))).as("cs"))
          .select(col("asset_id"), col("cs"), size(col("cs")).as("sz"))
        val ex = sets.select(col("asset_id"), explode(col("cs")).as("c"))
          .withColumn("bsz", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("c")))
          .filter(col("bsz") <= cap).drop("bsz")
        val cand = ex.as("x").join(ex.as("y"),
            col("x.c") === col("y.c") &&
              col("x.asset_id") < col("y.asset_id"))
          .select(col("x.asset_id").as("id_a"), col("y.asset_id").as("id_b"))
          .distinct()
        val inter = graft.expressions.SortedIntersectSize
          .sorted_intersect_size(col("sa"), col("sb"))
        cand
          .join(sets.select(col("asset_id").as("id_a"), col("cs").as("sa"),
            col("sz").as("sza")), "id_a")
          .join(sets.select(col("asset_id").as("id_b"), col("cs").as("sb")),
            "id_b")
          .select(col("id_a"), col("id_b"), inter.as("shared"),
            (inter.cast("double") / col("sza").cast("double"))
              .as("containment"))
          .filter(col("containment") >= 0.5)
          .orderBy("id_a", "id_b")
      },
      """WITH a AS (SELECT doc_id AS asset_id, text FROM documents),
        |ch AS (SELECT asset_id, list_sort(list_distinct(list_transform(
        |         range(0, GREATEST(CAST(ceil(octet_length(encode(text))
        |           / 64.0) AS BIGINT), 1)),
        |         i -> CAST(('0x' || substr(md5(substring(text,
        |           CAST(i * 64 + 1 AS INT), 64)), 1, 15))::UBIGINT
        |           AS BIGINT)))) AS cs
        |       FROM a),
        |sets AS (SELECT asset_id, cs, len(cs) AS sz FROM ch),
        |ex0 AS (SELECT asset_id, unnest(cs) AS c FROM sets),
        |ex AS (SELECT asset_id, c FROM (
        |         SELECT asset_id, c, COUNT(*) OVER (PARTITION BY c) AS bsz
        |         FROM ex0) WHERE bsz <= 50),
        |cand AS (SELECT DISTINCT x.asset_id AS id_a, y.asset_id AS id_b
        |         FROM ex x JOIN ex y ON x.c = y.c
        |           AND x.asset_id < y.asset_id),
        |v AS (SELECT id_a, id_b,
        |             len(list_intersect(sa.cs, sb.cs)) AS shared,
        |             sa.sz AS sza
        |      FROM cand JOIN sets sa ON cand.id_a = sa.asset_id
        |                JOIN sets sb ON cand.id_b = sb.asset_id)
        |SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared,
        |       CAST(shared AS DOUBLE) / CAST(sza AS DOUBLE) AS containment
        |FROM v WHERE CAST(shared AS DOUBLE) / CAST(sza AS DOUBLE) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin),

    // Typed-metadata access on the media table: filter by a metadata map
    // key and aggregate payload volume per (lang, source) — the
    // modality-routing step of a multimodal ingestion pipeline (map
    // lookups are per-row expressions; the only shuffle is the final
    // grouped count).
    "multimodal_metadata_filter" -> QuerySpec(
      (s, d) => {
        val assets = Multimodal.assetTable(Tables.documents(s, d))
        assets
          .filter(element_at(col("meta"), "lang").isin("en", "zh"))
          .groupBy(element_at(col("meta"), "lang").as("lang"),
            element_at(col("meta"), "source").as("source"))
          .agg(count(lit(1)).as("n"),
            sum(Multimodal.byteLength(col("bytes"))).as("total_bytes"))
          .orderBy("lang", "source")
      },
      """SELECT lang, source, COUNT(*) AS n,
        |       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents WHERE lang IN ('en', 'zh')
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin),

    // Deterministic frame sampling: four 64-byte slices, hex-rendered.
    "multimodal_frame_sample" -> QuerySpec(
      (s, d) => {
        val assets = Multimodal.assetTable(Tables.documents(s, d))
        assets.select(col("asset_id"),
            array_join(
              Multimodal.frameHex(col("bytes"), frameSize = 64, n = 4),
              ",").as("frames"))
          .orderBy("asset_id")
      },
      """SELECT doc_id AS asset_id,
        |       array_to_string(list_transform(range(0, 4),
        |         i -> hex(encode(substring(text, i*64 + 1, 64)))), ',') AS frames
        |FROM documents ORDER BY asset_id""".stripMargin),

    // The partition-batched decoder harness END TO END on the declared
    // path: assets → typed Dataset → mapPartitions decode (per-partition
    // init, the honest home for a real codec/model handle) → features.
    // The decode is the documented deterministic stub (byte stats + a
    // fixed-width byte projection standing in for an image/audio feature
    // vector), so the oracle reproduces it over character codes (corpus
    // is pure ASCII: byte k == ascii of char k). Feature components are
    // FLOAT math (byte/255 in single precision, like a real feature
    // extractor) widened losslessly to double for hashing.
    "multimodal_decode_batch" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val assets = Multimodal.assetTable(Tables.documents(s, d))
          .select(col("asset_id"), col("bytes")).as[Multimodal.Asset]
        val feats = (0 until 8).map(j =>
          element_at(col("feature"), j + 1).cast("double").as(s"f$j"))
        Multimodal.decodePartitions(assets).toDF()
          .select(Seq(col("asset_id"), col("n_bytes"), col("mean_byte"))
            ++ feats: _*)
          .orderBy("asset_id")
      },
      {
        val feats = (0 until 8).map(j =>
          s"CAST(CAST(bytes[($j % n_bytes) + 1] AS FLOAT) / " +
            s"CAST(255 AS FLOAT) AS DOUBLE) AS f$j").mkString(",\n|       ")
        s"""WITH b AS (
           |  SELECT doc_id AS asset_id,
           |         octet_length(encode(text)) AS n_bytes,
           |         list_transform(list_filter(string_split(text, ''),
           |           c -> c <> ''), c -> ascii(c)) AS bytes
           |  FROM documents)
           |SELECT asset_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |         list_transform(bytes, x -> CAST(x AS BIGINT))),
           |         (a, b) -> a + b) AS DOUBLE) / n_bytes AS mean_byte,
           |       $feats
           |FROM b ORDER BY asset_id""".stripMargin
      })
  )
}
