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
