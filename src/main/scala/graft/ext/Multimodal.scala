package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.expressions.ByteHistogram

/** Multimodal column surface (north-star X3): media as opaque binary
  * columns with typed metadata, plus the decode / feature-extract /
  * frame-sample plumbing.
  *
  * The actual codec step (JPEG decode, audio PCM, video frames) is STUBBED
  * — no media libraries ship in this offline image — behind
  * [[assetTable]]'s deterministic fake: bytes are the UTF-8 encoding of a
  * source text column. Everything around the stub is real engine surface:
  * the binary schema, per-row codegen'd feature kernels
  * ([[graft.expressions.ByteHistogram]]), deterministic frame slicing, and
  * metadata maps — swap the stub for a real decoder (mapPartitions over a
  * JNI codec, or a vectorized Python UDF in PySpark deployments) and the
  * rest of the pipeline is unchanged.
  *
  * Scale: all operators here are per-row expressions over the binary
  * column — single scan, no shuffle; frame sampling yields arrays, not
  * exploded rows, so row counts stay bounded until the caller explodes.
  */
object Multimodal {

  /** Deterministic fake "media" assets from a text corpus (the stub). */
  def assetTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      lit("text/plain;fake=1").as("media_type"),
      map(lit("lang"), col("lang"), lit("source"), col("source"))
        .as(("meta")))

  /** Byte length of the payload. */
  def byteLength(bytes: Column): Column = length(bytes).cast("long")

  /** Codegen'd byte-value histogram (see ByteHistogram). */
  def byteHistogram(bytes: Column, bins: Int = 16): Column =
    ByteHistogram.byte_histogram(bytes, bins)

  /** Deterministic frame sampling: `n` fixed-size byte slices (short
    * payloads yield short/empty tail frames, like a real frame grabber at
    * EOF). Returns array<binary>. */
  def frameSample(bytes: Column, frameSize: Int, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => substr(bytes, i * frameSize + 1, lit(frameSize)))

  /** Hex digest view of frames (portable rendering for downstream /
    * oracles). */
  def frameHex(bytes: Column, frameSize: Int, n: Int): Column =
    transform(frameSample(bytes, frameSize, n), f => hex(f))

  // ---- partition-batched decoder harness --------------------------------

  final case class Asset(asset_id: Long, bytes: Array[Byte])
  final case class DecodedFeatures(asset_id: Long, n_bytes: Long,
                                   mean_byte: Double, feature: Array[Float])

  /** The mapPartitions-shaped decode harness: the Scala analogue of a
    * vectorized (Arrow/Pandas) UDF — rows arrive per partition so a real
    * decoder can amortize codec/model initialization per batch instead of
    * per row. The decode itself is the deterministic STUB (byte stats + a
    * fixed-width projection standing in for an image/audio feature
    * vector); swap `decodeOne` for a JNI/codec call and the signature,
    * batching, and schema stay as-is.
    */
  def decodePartitions(assets: org.apache.spark.sql.Dataset[Asset])
      : org.apache.spark.sql.Dataset[DecodedFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // per-partition init happens HERE (decoder handles, model weights…)
      def decodeOne(a: Asset): DecodedFeatures = {
        val n = a.bytes.length
        var sum = 0L
        var i = 0
        while (i < n) { sum += (a.bytes(i) & 0xff); i += 1 }
        val feat = Array.tabulate(8)(j =>
          if (n == 0) 0f else (a.bytes(j % n) & 0xff).toFloat / 255f)
        DecodedFeatures(a.asset_id, n.toLong,
          if (n == 0) 0.0 else sum.toDouble / n, feat)
      }
      batch.map(decodeOne)
    }
  }
}
