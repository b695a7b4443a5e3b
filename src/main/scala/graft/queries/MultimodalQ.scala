package graft.queries

import org.apache.spark.sql.functions._
import graft.QuerySpec
import graft.ext.Multimodal
import graft.io.Tables

/** Multimodal pack: binary-column plumbing over UTF-8 payloads, plus a
  * REAL image-codec path (genuine PNGs encoded and decoded through the
  * JDK's javax.imageio — see [[graft.ext.Multimodal.pngAssetTable]]).
  * The corpus is pure ASCII (verified: max code point 121), so byte-level
  * oracles can be phrased over character codes in DuckDB, and the PNG
  * fixtures' rasters are deterministic functions of the text, so oracles
  * recompute the expected pixels relationally while the engine side
  * round-trips them through the actual codec. */
object MultimodalQ {

  /** One PNG encode per (session, sf-dir): the ingest artifact both
    * decode-side queries read. localCheckpointed so the ImageIO encode
    * cost is paid once, like any persisted binary corpus. */
  private val pngCache =
    new graft.util.SessionScopedCache[org.apache.spark.sql.DataFrame]()

  private def pngAssets(s: org.apache.spark.sql.SparkSession,
                        d: String): org.apache.spark.sql.DataFrame =
    pngCache.getOrBuild(s, d) {
      Multimodal.pngAssetTable(Tables.documents(s, d))
        .toDF().localCheckpoint(true)
    }

  /** Benchmark hook: encode the PNG corpus NOW so the cost lands in its
    * own timing entry instead of whichever decode query runs first. */
  def buildSharedPngStage(s: org.apache.spark.sql.SparkSession,
                          d: String, fresh: Boolean = false): Unit = {
    if (fresh) pngCache.evict(s, d)
    pngAssets(s, d); ()
  }

  /** One WAV encode per (session, sf-dir), same ingest-artifact
    * treatment as the PNGs: AudioSystem.write pays SPI + container
    * assembly per clip, so the encoded corpus is localCheckpointed once
    * and the query measures what it claims to — the real decode +
    * feature pass. */
  private val wavCache =
    new graft.util.SessionScopedCache[org.apache.spark.sql.DataFrame]()

  private def wavAssets(s: org.apache.spark.sql.SparkSession,
                        d: String): org.apache.spark.sql.DataFrame =
    wavCache.getOrBuild(s, d) {
      Multimodal.wavAssetTable(Tables.documents(s, d))
        .toDF().localCheckpoint(true)
    }

  /** Benchmark hook: encode the WAV corpus NOW (own timing entry). */
  def buildSharedWavStage(s: org.apache.spark.sql.SparkSession,
                          d: String, fresh: Boolean = false): Unit = {
    if (fresh) wavCache.evict(s, d)
    wavAssets(s, d); ()
  }

  /** Decoded raster table: real ImageIO decode of the cached PNG bytes. */
  private def decodedPngs(s: org.apache.spark.sql.SparkSession,
                          d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Multimodal.decodePngPartitions(
      pngAssets(s, d).as[Multimodal.PngAsset]).toDF()
  }

  /** Near-duplicate aHash pairs (id_a, id_b, dist ≤ 3) over the decoded
    * PNG corpus — shared by the pair listing and the hamming curve. The
    * 60 bit expressions are UNROLLED top-level element_at references,
    * not a transform() lambda over the array: multiple top-level
    * references block CollapseProject from inlining the pixel array, so
    * it materializes once per row (the lambda-CSE trap Dedup.shingles3
    * documents). simhashBandPairs then localCheckpoints the narrow
    * (id, ahash) table before its self-join — essential: without it the
    * decode would re-run per matched pair (the measured 95 s → ~1 s
    * round-6 cliff). Band scheme 4×15 bits is pigeonhole-complete for
    * hamming distance ≤ 3. */
  private def ahashPairs(s: org.apache.spark.sql.SparkSession,
                         d: String): org.apache.spark.sql.DataFrame = {
    val staged = decodedPngs(s, d)
      .withColumn("px", transform(col("pixels"), _.cast("long")))
      .withColumn("total", aggregate(col("px"), lit(0L), _ + _))
    val bitCols = (0 until 60).map { j =>
      when(element_at(col("px"), j + 1) * lit(60L) > col("total"),
        lit(1L)).otherwise(lit(0L))
    }
    val hashed = staged
      .withColumn("bits", array(bitCols: _*))
      .select(col("asset_id"),
        aggregate(col("bits"), lit(0L),
          (a, b) => a * lit(2L) + b).as("ahash"))
    graft.ext.Dedup.simhashBandPairs(hashed, "asset_id", "ahash",
      bands = 4, bitsPerBand = 15, maxDist = 3)
  }

  /** [[ahashPairs]] as DuckDB CTEs (tiny-scale all-pairs oracle), ending
    * in `ap(id_a, id_b, dist)`. */
  private def duckAhashPairCtes: String =
    s"""$duckPxCtes,
       |m AS (SELECT asset_id, px,
       |             list_reduce(list_prepend(CAST(0 AS BIGINT),
       |               list_transform(px, x -> CAST(x AS BIGINT))),
       |               (a, b) -> a + b) AS total
       |      FROM px),
       |bt AS (SELECT asset_id, list_transform(px, p -> CASE WHEN
       |         CAST(p AS BIGINT) * 60 > total
       |         THEN 1 ELSE 0 END) AS bits FROM m),
       |h AS (SELECT asset_id, list_reduce(
       |        list_prepend(CAST(0 AS BIGINT),
       |          list_transform(bits, b -> CAST(b AS BIGINT))),
       |        (a, b) -> a * 2 + b) AS ahash FROM bt),
       |ap AS (SELECT a.asset_id AS id_a, b.asset_id AS id_b,
       |         bit_count(xor(a.ahash, b.ahash)) AS dist
       |       FROM h a JOIN h b ON a.asset_id < b.asset_id
       |       WHERE bit_count(xor(a.ahash, b.ahash)) <= 3)""".stripMargin

  /** DuckDB CTEs (no WITH prefix) reproducing the deterministic rasters
    * of BOTH renditions: pixel j of the base raster is the mean
    * character code over document slice [⌊j·n/60⌋, ⌊(j+1)·n/60⌋) — the
    * exact box-filter formula in [[graft.ext.Multimodal.pixelLevel]] —
    * and the second rendition adds the global brightness offset 8.
    * Ends in `px(asset_id, px)`, asset_id = 2·doc_id + rendition. The
    * engine side must recover these integers from real PNG byte streams
    * for the hash to match. */
  private val duckPxCtes: String =
    """t AS (SELECT doc_id, list_transform(
      |         list_filter(string_split(text, ''), c -> c <> ''),
      |         c -> CAST(ascii(c) AS BIGINT)) AS codes,
      |       length(text) AS n FROM documents),
      |base AS (SELECT doc_id, list_transform(range(0, 60), j ->
      |         CASE WHEN n = 0 THEN 0 ELSE CAST(
      |           list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             codes[CAST(j*n//60 AS INT) + 1 :
      |                   CAST(j*n//60 AS INT) +
      |                   CAST(GREATEST((j+1)*n//60 - j*n//60, 1) AS INT)]),
      |             (a, b) -> a + b)
      |           // GREATEST((j+1)*n//60 - j*n//60, 1) AS INTEGER) END) AS px
      |       FROM t),
      |px AS (SELECT doc_id * 2 + r AS asset_id,
      |         CASE WHEN r = 0 THEN px
      |              ELSE list_transform(px, x -> x + 8) END AS px
      |       FROM base CROSS JOIN (SELECT unnest([0, 1]) AS r))""".stripMargin

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

    // Perceptual near-dup pairs via AVERAGE-HASH over REAL decoded
    // images — the aHash of classic image dedup: decode each PNG
    // (genuine ImageIO parse of the byte stream), set bit j when pixel
    // j exceeds the image mean. The fixture corpus carries two
    // renditions of every image (original + brightness-shifted
    // re-encode, both genuine PNGs — see pngAssetTable), so the pair
    // stage has real positives: aHash thresholds against the image's
    // OWN mean, so a global brightness shift preserves all 60 bits and
    // rendition pairs land at distance 0 — the invariance aHash exists
    // for, proven here through the actual codec. (Shingle-level text
    // near-dups are correctly NOT found: token edits scatter a
    // document's raster, and a perceptual hash answers "same image",
    // not "same text" — that's dedup_simhash's job.) The bit comparison
    // is an INTEGER cross-multiplication (px_j * 60 > total) — no
    // division, so no float drift — and the 60 bits pack into a long by
    // an exact a*2+b fold (stays under BIGINT overflow, which DuckDB
    // raises on). Pair generation reuses the simhash machinery: 4 bands
    // x 15 bits, pigeonhole-complete for hamming distance <= 3, hot
    // buckets bounded — never an all-pairs scan of the corpus; the
    // tiny-scale oracle verifies against a literal all-pairs hamming
    // join over the EXPECTED rasters (the codec round trip is what
    // makes the engine's hashes land on the oracle's).
    "multimodal_ahash_pairs" -> QuerySpec(
      (s, d) => ahashPairs(s, d).orderBy("id_a", "id_b"),
      s"""WITH $duckAhashPairCtes
        |SELECT id_a, id_b, dist FROM ap
        |ORDER BY id_a, id_b""".stripMargin),

    // aHash hamming-distance dedup CURVE — the image twin of
    // dedup_threshold_curve: for each hamming cutoff 0..3 (the band
    // scheme's pigeonhole-complete range), how many near-duplicate image
    // pairs qualify and how many assets the keep-smaller-id rule would
    // drop. The dial a multimodal curation pipeline turns between
    // "bit-identical renditions only" (0) and "visually close
    // variants" (3). Exact integer counts throughout; the sweep fans a
    // 4-value explode over the ALREADY-banded pair table, never
    // re-scanning or re-decoding the corpus.
    "multimodal_ahash_curve" -> QuerySpec(
      (s, d) => ahashPairs(s, d)
        .select(col("id_b"), col("dist"),
          explode(array(lit(0L), lit(1L), lit(2L), lit(3L))).as("dist_max"))
        .filter(col("dist") <= col("dist_max"))
        .groupBy("dist_max")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("id_b")).as("n_assets_dropped"))
        .orderBy("dist_max"),
      s"""WITH $duckAhashPairCtes,
        |th AS (SELECT unnest(CAST([0, 1, 2, 3] AS BIGINT[])) AS dist_max)
        |SELECT th.dist_max, COUNT(*) AS n_pairs,
        |       COUNT(DISTINCT ap.id_b) AS n_assets_dropped
        |FROM ap CROSS JOIN th WHERE ap.dist <= th.dist_max
        |GROUP BY th.dist_max ORDER BY dist_max""".stripMargin),

    // REAL image RESIZE through the codec, end to end: decode each
    // 10×6 PNG, area-average 2×2 blocks into a 5×3 raster, re-encode as
    // a genuine PNG, decode THAT, and emit the pixels. The oracle
    // recomputes the expected half-size raster relationally (floored
    // 2×2 block means over the generation-formula raster), so the hash
    // match proves the whole decode → resample → encode → decode chain
    // is lossless and exact. Note the brightness rendition commutes
    // with the box filter exactly — mean(px+8 over 4) = mean(px)+8 —
    // so both renditions verify against one formula. Scale shape:
    // per-row mapPartitions work, no shuffle until the final sort.
    "multimodal_resize_halve" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val resized = Multimodal.resizeHalf(
          pngAssets(s, d).as[Multimodal.PngAsset])
        Multimodal.decodePngPartitions(resized).toDF()
          .select(col("asset_id"), col("width"), col("height"),
            array_join(transform(col("pixels"), _.cast("string")), ",")
              .as("px_csv"),
            aggregate(transform(col("pixels"), _.cast("long")),
              lit(0L), _ + _).as("sum_px"))
          .orderBy("asset_id")
      },
      s"""WITH $duckPxCtes,
        |rs AS (SELECT asset_id, list_transform(range(0, 15), j ->
        |         CAST((CAST(px[CAST((j // 5) * 20 + (j % 5) * 2 + 1 AS INT)] AS BIGINT)
        |             + px[CAST((j // 5) * 20 + (j % 5) * 2 + 2 AS INT)]
        |             + px[CAST((j // 5) * 20 + (j % 5) * 2 + 11 AS INT)]
        |             + px[CAST((j // 5) * 20 + (j % 5) * 2 + 12 AS INT)])
        |           // 4 AS INTEGER)) AS rp
        |       FROM px)
        |SELECT asset_id, CAST(5 AS INTEGER) AS width,
        |       CAST(3 AS INTEGER) AS height,
        |       array_to_string(rp, ',') AS px_csv,
        |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |         list_transform(rp, x -> CAST(x AS BIGINT))),
        |         (a, b) -> a + b) AS BIGINT) AS sum_px
        |FROM rs ORDER BY asset_id""".stripMargin),

    // Temporal frame deltas over a sequence of REAL decoded PNG frames —
    // the shot-boundary primitive of a video ingestion pipeline: each
    // document becomes a 4-frame clip (one genuine PNG per frame,
    // sliding a half-document window), every frame is decoded through
    // the actual codec, and the per-transition delta Σ|px_f − px_{f−1}|
    // is computed from the decoded rasters. Distribution shape is the
    // real one: frames co-locate by clip id in ONE keyed shuffle
    // (collect_list of 4 × 60-int structs — bounded per key), deltas are
    // array folds. The oracle recomputes all four expected rasters from
    // the generation formula and replays the same integer deltas.
    "multimodal_frame_deltas" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val decoded = Multimodal.decodePngPartitions(
          Multimodal.pngFrameTable(Tables.documents(s, d))
            .as[Multimodal.PngAsset]).toDF()
        val byClip = decoded
          .select((col("asset_id") / 4).cast("long").as("asset_id"),
            (col("asset_id") % 4).cast("int").as("frame"), col("pixels"))
          .groupBy("asset_id")
          .agg(sort_array(collect_list(struct(col("frame"), col("pixels"))))
            .as("fr"))
        val delta = (f: Int) => aggregate(
          zip_with(
            element_at(col("fr"), f).getField("pixels"),
            element_at(col("fr"), f + 1).getField("pixels"),
            (a, b) => abs(a - b).cast("long")),
          lit(0L), _ + _)
        byClip.select(col("asset_id"),
            delta(1).as("d1"), delta(2).as("d2"), delta(3).as("d3"),
            (delta(1) + delta(2) + delta(3)).as("total_delta"))
          .orderBy("asset_id")
      },
      {
        val fpx = """CASE WHEN n = 0 THEN 0 ELSE CAST(
          |  list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    codes[CAST(f*n//8 + j*n//120 AS INT) + 1 :
          |          CAST(f*n//8 + j*n//120 AS INT) +
          |          CAST(GREATEST((f*n//8 + (j+1)*n//120)
          |                        - (f*n//8 + j*n//120), 1) AS INT)]),
          |    (a, b) -> a + b)
          |  // GREATEST((f*n//8 + (j+1)*n//120)
          |               - (f*n//8 + j*n//120), 1) AS BIGINT) END""".stripMargin
        def dsum(f: Int) =
          s"""CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |         list_transform(range(1, 61), j ->
             |           abs(fr[${f + 1}][CAST(j AS INT)]
             |               - fr[$f][CAST(j AS INT)]))),
             |         (a, b) -> a + b) AS BIGINT)""".stripMargin
        s"""WITH t AS (SELECT doc_id, list_transform(
           |         list_filter(string_split(text, ''), c -> c <> ''),
           |         c -> CAST(ascii(c) AS BIGINT)) AS codes,
           |       length(text) AS n FROM documents),
           |fr AS (SELECT doc_id AS asset_id,
           |         list_transform(range(0, 4), f ->
           |           list_transform(range(0, 60), j -> $fpx)) AS fr
           |       FROM t)
           |SELECT asset_id,
           |       ${dsum(1)} AS d1,
           |       ${dsum(2)} AS d2,
           |       ${dsum(3)} AS d3,
           |       ${dsum(1)} + ${dsum(2)} + ${dsum(3)} AS total_delta
           |FROM fr ORDER BY asset_id""".stripMargin
      }),

    // REAL audio codec, end to end — the second modality: each document's
    // deterministic 240-sample 16-bit PCM waveform is encoded as a
    // genuine RIFF/WAVE file (javax.sound.sampled — real header, real
    // PCM chunk), decoded back through AudioSystem's parser, and the
    // classic first-pass audio features are computed from the decoded
    // samples: per-frame absolute energy (4 × 60-sample frames) and the
    // zero-crossing count (strict sign-product test — integer-exact).
    // The oracle recomputes the expected samples from the generation
    // formula and aggregates them relationally; the hash match proves
    // the WAV round trip is lossless. Scale shape: per-row mapPartitions
    // codec work + per-row array folds, no shuffle until the final sort.
    "multimodal_audio_features" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val decoded = Multimodal.decodeWavPartitions(
          wavAssets(s, d).as[Multimodal.WavAsset]).toDF()
        val sAbs = (k: Int) => aggregate(
          slice(col("samples"), k * Multimodal.WavFrame + 1,
            Multimodal.WavFrame),
          lit(0L), (a, x) => a + abs(x).cast("long"))
        val zcr = aggregate(
          zip_with(col("samples"), slice(col("samples"), 2, 239),
            (a, b) => when(a * b < 0, lit(1L)).otherwise(lit(0L))),
          lit(0L), (a, x) => a + x)
        decoded.select(col("asset_id"), col("n_samples"),
            sAbs(0).as("e0"), sAbs(1).as("e1"),
            sAbs(2).as("e2"), sAbs(3).as("e3"),
            zcr.as("zcr"))
          .orderBy("asset_id")
      },
      {
        def absSum(k: Int) =
          s"""CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |         list_transform(s[${k * 60 + 1} : ${k * 60 + 60}],
             |           x -> CAST(abs(x) AS BIGINT))),
             |         (a, b) -> a + b) AS BIGINT) AS e$k""".stripMargin
        s"""WITH t AS (SELECT doc_id, list_transform(
           |         list_filter(string_split(text, ''), c -> c <> ''),
           |         c -> CAST(ascii(c) AS BIGINT)) AS codes,
           |       length(text) AS n FROM documents),
           |w AS (SELECT doc_id AS asset_id, list_transform(range(0, 240), t ->
           |         CASE WHEN n = 0 THEN 0 ELSE (CAST(
           |           list_reduce(list_prepend(CAST(0 AS BIGINT),
           |             codes[CAST(t*n//240 AS INT) + 1 :
           |                   CAST(t*n//240 AS INT) +
           |                   CAST(GREATEST((t+1)*n//240 - t*n//240, 1) AS INT)]),
           |             (a, b) -> a + b)
           |           // GREATEST((t+1)*n//240 - t*n//240, 1) AS INTEGER)
           |           - 96) * 256 END) AS s
           |       FROM t)
           |SELECT asset_id, CAST(240 AS INTEGER) AS n_samples,
           |       ${(0 to 3).map(absSum).mkString(",\n|       ")},
           |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |         list_transform(range(2, 241), i ->
           |           CASE WHEN s[CAST(i AS INT)] * s[CAST(i - 1 AS INT)] < 0
           |                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
           |         (a, b) -> a + b) AS BIGINT) AS zcr
           |FROM w ORDER BY asset_id""".stripMargin
      }),

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

    // The partition-batched decoder harness END TO END with a REAL codec
    // in it: documents → genuine grayscale PNGs (ImageIO encode, cached
    // once per session as the ingest artifact) → typed Dataset →
    // mapPartitions decode (per-partition codec init — ImageIO disk
    // cache off) → pixel rasters → features. The oracle recomputes the
    // EXPECTED raster from the deterministic generation formula; the
    // engine side must recover the identical integers from the actual
    // PNG byte stream (header + zlib IDAT), so the hash match IS the
    // lossless round-trip proof. Feature components are pixel/255 in
    // IEEE double — one division of exact integers, written identically
    // on both sides (Spark promotes fractional division to double, so
    // double-from-the-start is the cross-engine-stable form).
    "multimodal_decode_batch" -> QuerySpec(
      (s, d) => {
        val feats = (0 until 8).map(j =>
          (element_at(col("pixels"), j + 1).cast("double") /
            lit(255.0)).as(s"f$j"))
        decodedPngs(s, d)
          .withColumn("sum_px", aggregate(
            transform(col("pixels"), _.cast("long")), lit(0L), _ + _))
          .select(Seq(col("asset_id"), col("width"), col("height"),
            size(col("pixels")).as("n_px"), col("sum_px"),
            (col("sum_px").cast("double") / lit(60.0)).as("mean_px"))
            ++ feats: _*)
          .orderBy("asset_id")
      },
      {
        val feats = (0 until 8).map(j =>
          s"CAST(px[$j + 1] AS DOUBLE) / 255.0 AS f$j")
          .mkString(",\n|       ")
        s"""WITH $duckPxCtes
           |SELECT asset_id,
           |       CAST(10 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
           |       CAST(60 AS INTEGER) AS n_px,
           |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |         list_transform(px, x -> CAST(x AS BIGINT))),
           |         (a, b) -> a + b) AS BIGINT) AS sum_px,
           |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |         list_transform(px, x -> CAST(x AS BIGINT))),
           |         (a, b) -> a + b) AS DOUBLE) / 60.0 AS mean_px,
           |       $feats
           |FROM px ORDER BY asset_id""".stripMargin
      }),

    // Patch-grid statistics — the ViT patch-embedding prep: each decoded
    // 10×6 raster splits into a 2×2 grid of 5×3 patches and every patch
    // emits (sum, mean, min, max) — the per-patch normalization
    // statistics an image tokenizer computes before projecting patches
    // into embedding space. The pixels come through the REAL ImageIO
    // PNG decode of the cached byte streams (the oracle recomputes the
    // deterministic raster arithmetically — the hash match re-proves
    // the lossless round trip at patch granularity). Index math is
    // division-free on both engines (nested row/col ranges, no
    // floor-of-double anywhere); the patch explode is a narrow 4×
    // row-multiplier on the decoded table — no shuffle until the final
    // sort. At production resolution the same shape holds: patches per
    // image is a constant grid, so the stage stays a per-row map.
    "multimodal_patch_grid" -> QuerySpec(
      (s, d) => {
        val patches = array(
          struct(lit(0).as("pr"), lit(0).as("pc")),
          struct(lit(0).as("pr"), lit(1).as("pc")),
          struct(lit(1).as("pr"), lit(0).as("pc")),
          struct(lit(1).as("pr"), lit(1).as("pc")))
        val vals = flatten(transform(sequence(lit(0), lit(2)), r =>
          transform(sequence(lit(0), lit(4)), c =>
            element_at(col("pixels"),
              (col("p.pr") * 3 + r) * 10 + col("p.pc") * 5 + c + 1))))
        decodedPngs(s, d)
          .select(col("asset_id"), col("pixels"),
            explode(patches).as("p"))
          .select(col("asset_id"),
            (col("p.pr") * 2 + col("p.pc")).as("patch_id"),
            vals.as("vals"))
          .select(col("asset_id"), col("patch_id"),
            aggregate(transform(col("vals"), _.cast("long")), lit(0L),
              _ + _).as("patch_sum"),
            array_min(col("vals")).as("patch_min"),
            array_max(col("vals")).as("patch_max"))
          .withColumn("patch_mean",
            col("patch_sum").cast("double") / lit(15.0))
          .select(col("asset_id"), col("patch_id"), col("patch_sum"),
            col("patch_mean"), col("patch_min"), col("patch_max"))
          .orderBy("asset_id", "patch_id")
      },
      s"""WITH $duckPxCtes,
         |g AS (SELECT asset_id, pr * 2 + pc AS patch_id,
         |        flatten(list_transform(range(0, 3), r ->
         |          list_transform(range(0, 5), c ->
         |            px[(pr * 3 + r) * 10 + pc * 5 + c + 1]))) AS vals
         |      FROM px CROSS JOIN (VALUES (0, 0), (0, 1), (1, 0), (1, 1))
         |        t(pr, pc)),
         |a AS (SELECT asset_id, patch_id,
         |        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(vals, x -> CAST(x AS BIGINT))),
         |          (x, y) -> x + y) AS BIGINT) AS patch_sum,
         |        list_aggregate(vals, 'min') AS patch_min,
         |        list_aggregate(vals, 'max') AS patch_max
         |      FROM g)
         |SELECT asset_id, patch_id, patch_sum,
         |       CAST(patch_sum AS DOUBLE) / 15.0 AS patch_mean,
         |       patch_min, patch_max
         |FROM a ORDER BY asset_id, patch_id""".stripMargin),

    // DCT perceptual hash (pHash) over the decoded rasters — the
    // frequency-domain image fingerprint one step past aHash: box-average
    // the 60-pixel raster into 16 bins, project onto the first 8 NON-DC
    // Sobel edge density over the decoded 10×6 PNG rasters: per image,
    // the 3×3 Sobel gradient (Gx, Gy) at each of the 32 interior pixels,
    // summarized as total squared gradient energy Σ(gx²+gy²), the count
    // of edge pixels (gx²+gy² ≥ 32²), and their density — the cheap
    // image-complexity feature a multimodal curation pipeline uses to
    // drop blank/flat assets before expensive model scoring. EVERYTHING
    // stays in exact integer arithmetic: pixel levels are integers, the
    // convolution taps are ±1/±2, and edge strength is kept SQUARED
    // (never sqrt'ed), so the only float op is the final density
    // division — parity is structural, not numeric. Scale shape: decode
    // rides the shared PNG stage; the convolution is one per-row fold
    // over a literal 32-position lattice (codegen'd, zero joins, zero
    // shuffle beyond the final orderBy of ~2 rows/doc).
    "multimodal_sobel_edge_density" -> QuerySpec(
      (s, d) => {
        val staged = decodedPngs(s, d)
          .withColumn("px", transform(col("pixels"), _.cast("long")))
        def at(r: org.apache.spark.sql.Column,
               c: org.apache.spark.sql.Column) =
          element_at(col("px"), (r * 10 + c + 1).cast("int"))
        def g2(r: org.apache.spark.sql.Column,
               c: org.apache.spark.sql.Column) = {
          val gx = at(r - 1, c + 1) - at(r - 1, c - 1) +
            (at(r, c + 1) - at(r, c - 1)) * lit(2L) +
            at(r + 1, c + 1) - at(r + 1, c - 1)
          val gy = at(r + 1, c - 1) - at(r - 1, c - 1) +
            (at(r + 1, c) - at(r - 1, c)) * lit(2L) +
            at(r + 1, c + 1) - at(r - 1, c + 1)
          gx * gx + gy * gy
        }
        staged
          .withColumn("g2s", flatten(transform(sequence(lit(1), lit(4)),
            r => transform(sequence(lit(1), lit(8)), c => g2(r, c)))))
          .select(col("asset_id"),
            aggregate(col("g2s"), lit(0L), (a, x) => a + x)
              .as("sum_grad2"),
            aggregate(col("g2s"), lit(0L),
              (a, x) => a + when(x >= lit(1024L), 1L).otherwise(0L))
              .as("n_edge"))
          .withColumn("edge_density",
            col("n_edge").cast("double") / lit(32.0))
          .orderBy("asset_id")
      },
      s"""WITH $duckPxCtes,
         |g AS (SELECT asset_id, flatten(list_transform(range(1, 5),
         |        r -> list_transform(range(1, 9), c ->
         |          (px[CAST(r*10+c-8 AS INT)] - px[CAST(r*10+c-10 AS INT)]
         |             + (px[CAST(r*10+c+2 AS INT)]
         |                - px[CAST(r*10+c AS INT)]) * 2
         |             + px[CAST(r*10+c+12 AS INT)]
         |             - px[CAST(r*10+c+10 AS INT)]) *
         |          (px[CAST(r*10+c-8 AS INT)] - px[CAST(r*10+c-10 AS INT)]
         |             + (px[CAST(r*10+c+2 AS INT)]
         |                - px[CAST(r*10+c AS INT)]) * 2
         |             + px[CAST(r*10+c+12 AS INT)]
         |             - px[CAST(r*10+c+10 AS INT)]) +
         |          (px[CAST(r*10+c+10 AS INT)] - px[CAST(r*10+c-10 AS INT)]
         |             + (px[CAST(r*10+c+11 AS INT)]
         |                - px[CAST(r*10+c-9 AS INT)]) * 2
         |             + px[CAST(r*10+c+12 AS INT)]
         |             - px[CAST(r*10+c-8 AS INT)]) *
         |          (px[CAST(r*10+c+10 AS INT)] - px[CAST(r*10+c-10 AS INT)]
         |             + (px[CAST(r*10+c+11 AS INT)]
         |                - px[CAST(r*10+c-9 AS INT)]) * 2
         |             + px[CAST(r*10+c+12 AS INT)]
         |             - px[CAST(r*10+c-8 AS INT)]))))
         |        AS g2s
         |      FROM px)
         |SELECT asset_id,
         |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), g2s),
         |         (a, b) -> a + b) AS BIGINT) AS sum_grad2,
         |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(g2s, x -> CASE WHEN x >= 1024
         |           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
         |         (a, b) -> a + b) AS BIGINT) AS n_edge,
         |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(g2s, x -> CASE WHEN x >= 1024
         |           THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
         |         (a, b) -> a + b) AS DOUBLE) / 32.0 AS edge_density
         |FROM g ORDER BY asset_id""".stripMargin),

    // DCT-II basis vectors, hash bit k = [coefficient_k > 0]. Because
    // every retained basis vector is DC-free, the hash is EXACTLY
    // brightness-invariant — the +8-offset second rendition of each doc
    // must collide at Hamming 0, which this query verifies per doc
    // (aHash needed a threshold to absorb the same offset; pHash
    // absorbs it structurally). The transcendental cos() basis is
    // evaluated ONCE at plan build and embedded as shared literals in
    // both plans (the planeWeights discipline — no libm call at row
    // scope on either engine); bin means are exact-integer sums divided
    // once, and each projection is the sequential fold both engines
    // share. Scale: decode batches via the shared PNG stage, then one
    // narrow per-row projection; the rendition pivot is a keyed agg on
    // doc_id — no self-join, no shuffle wider than the 2-row groups.
    "multimodal_phash_dct" -> QuerySpec(
      (s, d) => {
        val C: Seq[Seq[Double]] = (1 to 8).map(k =>
          (0 until 16).map(j => math.cos(math.Pi * (2 * j + 1) * k / 32.0)))
        val staged = decodedPngs(s, d)
          .withColumn("px", transform(col("pixels"), _.cast("long")))
        val binCols = (0 until 16).map { b =>
          val lo = b * 60 / 16; val hi = (b + 1) * 60 / 16
          ((lo + 1 to hi).map(i => element_at(col("px"), i))
            .reduce(_ + _).cast("double") / lit((hi - lo).toDouble))
            .as(s"m$b")
        }
        val binned = staged.select(col("asset_id") +: binCols: _*)
        val coeffs = (0 until 8).map { ki =>
          aggregate(
            array((0 until 16).map(j =>
              col(s"m$j") * lit(C(ki)(j))): _*),
            lit(0.0), (acc, x) => acc + x)
        }
        val phash = coeffs.zipWithIndex.map { case (c, ki) =>
          when(c > lit(0.0), lit(1L << ki)).otherwise(lit(0L))
        }.reduce(_ + _)
        binned.select(col("asset_id"), phash.as("ph"))
          .select(expr("asset_id div 2").as("doc_id"),
            (col("asset_id") % 2).as("r"), col("ph"))
          .groupBy("doc_id")
          .agg(max(when(col("r") === 0, col("ph"))).as("phash_base"),
            max(when(col("r") === 1, col("ph"))).as("phash_bright"))
          .select(col("doc_id"), col("phash_base"), col("phash_bright"),
            bit_count(col("phash_base").bitwiseXOR(col("phash_bright")))
              .cast("long").as("dist"))
          .orderBy("doc_id")
      },
      {
        val C: Seq[Seq[Double]] = (1 to 8).map(k =>
          (0 until 16).map(j => math.cos(math.Pi * (2 * j + 1) * k / 32.0)))
        val binDefs = (0 until 16).map { b =>
          val lo = b * 60 / 16; val hi = (b + 1) * 60 / 16
          s"""CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             |  px[${lo + 1}:$hi]), (a, b) -> a + b) AS DOUBLE)
             |  / ${(hi - lo).toDouble} AS m$b""".stripMargin
        }.mkString(",\n")
        val coeffDefs = (0 until 8).map { ki =>
          val terms = (0 until 16).map(j =>
            s"m$j * ${C(ki)(j)}").mkString("[", ", ", "]")
          s"""CASE WHEN list_reduce(list_prepend(0.0, $terms),
             |  (a, b) -> a + b) > 0.0
             |  THEN CAST(${1L << ki} AS BIGINT) ELSE CAST(0 AS BIGINT)
             |  END""".stripMargin
        }.mkString(" + ")
        s"""WITH $duckPxCtes,
           |m AS (SELECT asset_id,
           |$binDefs
           |FROM px),
           |h AS (SELECT asset_id, $coeffDefs AS ph FROM m),
           |p AS (SELECT asset_id // 2 AS doc_id, asset_id % 2 AS r, ph
           |      FROM h)
           |SELECT doc_id,
           |       MAX(CASE WHEN r = 0 THEN ph END) AS phash_base,
           |       MAX(CASE WHEN r = 1 THEN ph END) AS phash_bright,
           |       CAST(bit_count(xor(MAX(CASE WHEN r = 0 THEN ph END),
           |                          MAX(CASE WHEN r = 1 THEN ph END)))
           |         AS BIGINT) AS dist
           |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Chromaprint-style audio fingerprint over the decoded PCM — the
    // audio twin of the DCT pHash: per 60-sample frame, band energy in 4
    // DFT bins (|Σ s_t·e^{-2πibt/60}|², the spectral footprint), then
    // fingerprint bit (f, b) = [E_{f,b} > E_{f-1,b}] — the
    // energy-DELTA coding real audio fingerprinters use because it
    // survives gain changes. The sin/cos basis is evaluated once at plan
    // build and embedded as shared literals (the planeWeights
    // discipline); each projection is the engines' shared sequential
    // fold over exact-integer samples, and re²+im² / the comparisons are
    // identical IEEE ops. The re/im folds bind in their OWN projection
    // before the energy products reference them (the let-binding lesson
    // — Column DSL re-inlines multiply-referenced trees otherwise).
    // Scale: decode batches via the shared WAV stage, then one narrow
    // per-row pipeline — no shuffle at any corpus size.
    "multimodal_audio_fingerprint" -> QuerySpec(
      (s, d) => {
        import s.implicits._
        val cosB = (1 to 4).map(b =>
          Array.tabulate(60)(t => math.cos(2 * math.Pi * b * t / 60.0)))
        val sinB = (1 to 4).map(b =>
          Array.tabulate(60)(t => math.sin(2 * math.Pi * b * t / 60.0)))
        val decoded = Multimodal.decodeWavPartitions(
          wavAssets(s, d).as[Multimodal.WavAsset]).toDF()
        def fold(f: Int, basis: Array[Double]) = aggregate(
          array((0 until 60).map(t =>
            element_at(col("samples"), f * 60 + t + 1).cast("double") *
              lit(basis(t))): _*),
          lit(0.0), (a, x) => a + x)
        val parts = for { f <- 0 until 4; b <- 0 until 4 } yield Seq(
          fold(f, cosB(b)).as(s"re_${f}_$b"),
          fold(f, sinB(b)).as(s"im_${f}_$b"))
        val bound = decoded.select(col("asset_id") +: parts.flatten: _*)
        val energies = bound.select(col("asset_id") +:
          (for { f <- 0 until 4; b <- 0 until 4 } yield
            (col(s"re_${f}_$b") * col(s"re_${f}_$b") +
              col(s"im_${f}_$b") * col(s"im_${f}_$b")).as(s"e_${f}_$b")): _*)
        val fp = (for { f <- 1 until 4; b <- 0 until 4 } yield
          when(col(s"e_${f}_$b") > col(s"e_${f - 1}_$b"),
            lit(1L << ((f - 1) * 4 + b))).otherwise(lit(0L)))
          .reduce(_ + _)
        energies.select(col("asset_id"), fp.as("fp"))
          .orderBy("asset_id")
      },
      {
        val cosB = (1 to 4).map(b =>
          Array.tabulate(60)(t => math.cos(2 * math.Pi * b * t / 60.0)))
        val sinB = (1 to 4).map(b =>
          Array.tabulate(60)(t => math.sin(2 * math.Pi * b * t / 60.0)))
        def litList(a: Array[Double]) = a.mkString("[", ", ", "]")
        def foldSql(basis: Array[Double]) =
          s"""list_reduce(list_prepend(0.0, list_transform(range(1, 61),
             |  t -> CAST(s[CAST(f * 60 + t AS INT)] AS DOUBLE)
             |       * (${litList(basis)})[t])), (a, b) -> a + b)""".stripMargin
        val enDefs = (0 until 4).map { b =>
          s"""${foldSql(cosB(b))} AS re_$b,
             |${foldSql(sinB(b))} AS im_$b""".stripMargin
        }.mkString(",\n")
        val pivot = (for { f <- 0 until 4; b <- 0 until 4 } yield
          s"MAX(CASE WHEN f = $f THEN re_$b * re_$b + im_$b * im_$b END) " +
            s"AS e_${f}_$b").mkString(",\n")
        val fp = (for { f <- 1 until 4; b <- 0 until 4 } yield
          s"CASE WHEN e_${f}_$b > e_${f - 1}_$b THEN CAST(${1L << ((f - 1) * 4 + b)} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
          .mkString(" + ")
        s"""WITH t AS (SELECT doc_id, list_transform(
           |         list_filter(string_split(text, ''), c -> c <> ''),
           |         c -> CAST(ascii(c) AS BIGINT)) AS codes,
           |       length(text) AS n FROM documents),
           |w AS (SELECT doc_id AS asset_id, list_transform(range(0, 240), t ->
           |         CASE WHEN n = 0 THEN 0 ELSE (CAST(
           |           list_reduce(list_prepend(CAST(0 AS BIGINT),
           |             codes[CAST(t*n//240 AS INT) + 1 :
           |                   CAST(t*n//240 AS INT) +
           |                   CAST(GREATEST((t+1)*n//240 - t*n//240, 1) AS INT)]),
           |             (a, b) -> a + b)
           |           // GREATEST((t+1)*n//240 - t*n//240, 1) AS INTEGER)
           |           - 96) * 256 END) AS s
           |       FROM t),
           |en AS (SELECT asset_id, f,
           |$enDefs
           |FROM w CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS f)),
           |pv AS (SELECT asset_id,
           |$pivot
           |FROM en GROUP BY 1)
           |SELECT asset_id, $fp AS fp
           |FROM pv ORDER BY asset_id""".stripMargin
      })
  )
}
