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

    // Perceptual near-dup pairs via AVERAGE-HASH (the aHash of classic
    // image dedup, computed over the byte stream since the real decoder
    // is stubbed): the payload is cut into 60 equal segments and bit j
    // is set when segment j's mean byte exceeds the global mean. Both
    // comparisons are INTEGER cross-multiplications (segSum * n >
    // total * segLen) — no division, so no float drift — and the bits
    // pack into a 60-bit long by an exact a*2+b fold (no shifts; stays
    // under BIGINT overflow, which DuckDB raises on). Pair generation
    // reuses the simhash machinery: 4 bands x 15 bits, pigeonhole-
    // complete for hamming distance <= 3, hot buckets bounded — never an
    // all-pairs scan of the corpus; the tiny-scale oracle verifies
    // against a literal all-pairs hamming join.
    "multimodal_ahash_pairs" -> QuerySpec(
      (s, d) => {
        val assets = Multimodal.assetTable(Tables.documents(s, d))
        // ASCII corpus: byte stream == character-code stream (see header)
        // The 60 segment bits are UNROLLED top-level expressions, not a
        // transform() over sequence(0,59): a lambda body that references
        // `codes` re-evaluates the whole split+ascii chain per element
        // (lambda bodies defeat CSE — the same trap Dedup.shingles3
        // documents), which measured 60× the tokenize cost (~100 s at
        // sf0.1). Sixty top-level references instead BLOCK CollapseProject
        // from inlining `codes`, so the array materializes once per row
        // and each slice is O(L) over the stored array: ~3 passes total.
        val staged = assets
          .withColumn("txt", decode(col("bytes"), "UTF-8"))
          .withColumn("codes", transform(
            filter(split(col("txt"), ""), c => c =!= ""),
            c => ascii(c).cast("long")))
          .withColumn("n", size(col("codes")).cast("long"))
          .withColumn("total", aggregate(col("codes"), lit(0L), _ + _))
          .withColumn("L", ceil(col("n") / 60.0).cast("int"))
        val bitCols = (0 until 60).map { j =>
          val seg = slice(col("codes"), col("L") * j + 1, col("L"))
          val segSum = aggregate(seg, lit(0L), _ + _)
          when(segSum * col("n") > col("total") * size(seg).cast("long"),
            lit(1L)).otherwise(lit(0L))
        }
        // simhashBandPairs materializes the narrow fingerprint table
        // before its self-join — essential here: the 60-fold hash is an
        // interpreted higher-order expression, and unmaterialized it was
        // re-evaluated once per MATCHED PAIR (measured 95 s → ~1 s; see
        // the helper's doc).
        val hashed = staged
          .withColumn("bits", array(bitCols: _*))
          .select(col("asset_id"),
            aggregate(col("bits"), lit(0L),
              (a, b) => a * lit(2L) + b).as("ahash"))
        graft.ext.Dedup.simhashBandPairs(hashed, "asset_id", "ahash",
            bands = 4, bitsPerBand = 15, maxDist = 3)
          .orderBy("id_a", "id_b")
      },
      """WITH c AS (SELECT doc_id, list_transform(
        |             list_filter(string_split(text, ''), c -> c <> ''),
        |             c -> CAST(ascii(c) AS BIGINT)) AS codes
        |           FROM documents),
        |m AS (SELECT doc_id, codes, len(codes) AS n,
        |             list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
        |               (a, b) -> a + b) AS total,
        |             CAST(ceil(len(codes) / 60.0) AS INT) AS L
        |      FROM c),
        |sg AS (SELECT doc_id, n, total,
        |              list_transform(range(0, 60),
        |                j -> codes[j*L+1 : j*L+L]) AS segs
        |       FROM m),
        |bt AS (SELECT doc_id, list_transform(segs, seg -> CASE WHEN
        |         list_reduce(list_prepend(CAST(0 AS BIGINT), seg),
        |           (a, x) -> a + x) * n > total * len(seg)
        |         THEN 1 ELSE 0 END) AS bits FROM sg),
        |h AS (SELECT doc_id, list_reduce(
        |        list_prepend(CAST(0 AS BIGINT), bits),
        |        (a, b) -> a * 2 + b) AS ahash FROM bt)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       bit_count(xor(a.ahash, b.ahash)) AS dist
        |FROM h a JOIN h b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
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
