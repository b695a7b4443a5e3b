package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.expressions.ByteHistogram

/** Multimodal column surface (north-star X3): media as opaque binary
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * Two payload families:
  *
  *  - [[assetTable]]: UTF-8 document payloads as `binary` — the
  *    modality-agnostic surface (byte stats, histograms, chunk-hash
  *    dedup, frame slicing work on ANY payload, text or media).
  *  - [[pngAssetTable]] / [[decodePngPartitions]]: a REAL image codec
  *    path, offline-safe via the JDK's `javax.imageio`. Each document is
  *    rendered into a genuine grayscale PNG (a 10×6 "thumbnail" whose
  *    pixels stride-sample the document — deterministic, so oracles can
  *    recompute the expected raster), and the decode side parses the
  *    actual PNG byte stream back into pixels inside the
  *    partition-batched harness. The codec is real (zlib/PNG encode +
  *    decode round trip through ImageIO); only the *content* of the
  *    fixture images is synthetic, as any reproducible test corpus's
  *    must be.
  *
  * Scale: expression operators here are per-row over the binary column —
  * single scan, no shuffle; frame sampling yields arrays, not exploded
  * rows. The codec runs in `mapPartitions` so a real deployment can
  * amortize decoder/model initialization per batch instead of per row
  * (the same shape a vectorized Arrow/Pandas UDF gives PySpark).
  */
object Multimodal {

  /** UTF-8 document payloads as a binary asset table. */
  def assetTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("bytes"),
      lit("text/plain;charset=utf-8").as("media_type"),
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

  // ---- real PNG codec path (javax.imageio, JDK-offline-safe) -----------

  /** 10×6 = 60 pixels: one per aHash bit (60 keeps the packed hash inside
    * a signed 64-bit long — DuckDB BIGINT raises on overflow). */
  val PngWidth = 10
  val PngHeight = 6
  val PngPixels: Int = PngWidth * PngHeight

  final case class PngAsset(asset_id: Long, png: Array[Byte])
  final case class DecodedImage(asset_id: Long, width: Int, height: Int,
                                pixels: Array[Int])

  /** Deterministic gray level of pixel j for a document of length n: the
    * box-filtered downsample a real thumbnailer computes — the mean
    * character code over slice [⌊j·n/60⌋, ⌊(j+1)·n/60⌋) (floor-divided,
    * so integer-exact cross-engine). Averaging makes the raster robust
    * to small insertions (a point sample would shift EVERY pixel of a
    * near-dup edit); near-dup documents get near-identical rasters,
    * unrelated ones diverge. Mirrored verbatim by the DuckDB oracles. */
  def pixelLevel(text: String, j: Int): Int = {
    val n = text.length
    if (n == 0) 0
    else {
      val start = j * n / PngPixels
      val len = math.max((j + 1) * n / PngPixels - start, 1)
      var sum = 0
      var i = start
      while (i < start + len) { sum += text.charAt(i).toInt & 0xff; i += 1 }
      sum / len
    }
  }

  /** Gray-level offset of the second rendition: a global brightness
    * shift, the canonical perturbation a re-encoded copy of an image
    * carries. Stays inside 0..255 for this corpus (box-filtered ASCII
    * means top out at 122). */
  val RenditionBrightness = 8

  /** Render each document into TWO genuine grayscale PNGs via ImageIO —
    * the original raster (asset_id = 2·doc_id) and a brightness-shifted
    * re-encode (asset_id = 2·doc_id + 1). A perceptual-dedup corpus is
    * precisely one that contains multiple renditions of the same
    * content; modelling the renditions in the fixture gives the pair
    * stage REAL positives to find. The `png` column holds genuine,
    * decodable image files (header, zlib-compressed IDAT and all).
    * Per-partition init disables ImageIO's disk cache
    * (temp-file-per-image is the classic throughput killer). */
  def pngAssetTable(docs: DataFrame): Dataset[PngAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { batch =>
        ImageIO.setUseCache(false)
        def render(id: Long, text: String, offset: Int): PngAsset = {
          val img = new java.awt.image.BufferedImage(
            PngWidth, PngHeight, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var j = 0
          while (j < PngPixels) {
            raster.setSample(j % PngWidth, j / PngWidth, 0,
              pixelLevel(text, j) + offset)
            j += 1
          }
          val out = new ByteArrayOutputStream(256)
          ImageIO.write(img, "png", out)
          PngAsset(id, out.toByteArray)
        }
        batch.flatMap { case (id, text) => Iterator(
          render(2 * id, text, 0),
          render(2 * id + 1, text, RenditionBrightness))
        }
      }
  }

  /** REAL image resize: decode each PNG, box-filter 2×2 blocks into a
    * half-size raster (each output pixel is the floored mean of its
    * 2×2 input block — the classic area-average downsample), and
    * RE-ENCODE the result as a genuine PNG. Decode → resample → encode
    * is the full thumbnailing chain a media pipeline runs, here with
    * the actual codec on both ends. Requires even dimensions. */
  def resizeHalf(assets: Dataset[PngAsset]): Dataset[PngAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      ImageIO.setUseCache(false)
      batch.map { a =>
        val img = ImageIO.read(new ByteArrayInputStream(a.png))
        require(img != null, s"asset ${a.asset_id}: not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        require(w % 2 == 0 && h % 2 == 0,
          s"asset ${a.asset_id}: resizeHalf needs even dims, got ${w}x$h")
        val in = img.getRaster
        val out = new java.awt.image.BufferedImage(
          w / 2, h / 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val outRaster = out.getRaster
        var r = 0
        while (r < h / 2) {
          var c = 0
          while (c < w / 2) {
            val s = in.getSample(2 * c, 2 * r, 0) +
              in.getSample(2 * c + 1, 2 * r, 0) +
              in.getSample(2 * c, 2 * r + 1, 0) +
              in.getSample(2 * c + 1, 2 * r + 1, 0)
            outRaster.setSample(c, r, 0, s / 4)
            c += 1
          }
          r += 1
        }
        val bytes = new ByteArrayOutputStream(128)
        ImageIO.write(out, "png", bytes)
        PngAsset(a.asset_id, bytes.toByteArray)
      }
    }
  }

  /** 4 frames per clip; frame f's 60 pixels box-filter the half-document
    * window starting at ⌊f·n/8⌋ — a sliding window, so consecutive
    * frames overlap 75% and their pixel deltas are small except where
    * content shifts (the shot-boundary signal). */
  val ClipFrames = 4

  /** Gray level of pixel j in frame f: mean character code over
    * [⌊f·n/8⌋ + ⌊j·n/120⌋, ⌊f·n/8⌋ + ⌊(j+1)·n/120⌋) (all floors taken
    * separately, mirrored verbatim in the DuckDB oracle). */
  def framePixelLevel(text: String, f: Int, j: Int): Int = {
    val n = text.length
    if (n == 0) 0
    else {
      val base = f * n / 8
      val start = base + j * n / 120
      val len = math.max(base + (j + 1) * n / 120 - start, 1)
      var sum = 0
      var i = start
      while (i < start + len) { sum += text.charAt(i).toInt & 0xff; i += 1 }
      sum / len
    }
  }

  /** A "video" fixture: each document becomes a 4-frame clip of REAL
    * PNGs (one genuine encode per frame; asset_id = 4·doc_id + frame).
    * The frames slide a half-document window, the shape a frame grabber
    * hands a shot-boundary detector. */
  def pngFrameTable(docs: DataFrame): Dataset[PngAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { batch =>
        ImageIO.setUseCache(false)
        batch.flatMap { case (id, text) =>
          (0 until ClipFrames).iterator.map { f =>
            val img = new java.awt.image.BufferedImage(
              PngWidth, PngHeight,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var j = 0
            while (j < PngPixels) {
              raster.setSample(j % PngWidth, j / PngWidth, 0,
                framePixelLevel(text, f, j))
              j += 1
            }
            val out = new ByteArrayOutputStream(256)
            ImageIO.write(img, "png", out)
            PngAsset(4 * id + f, out.toByteArray)
          }
        }
      }
  }

  // ---- real WAV codec path (javax.sound.sampled, JDK-offline-safe) ----

  /** 240 PCM samples per clip: 30 ms at 8 kHz — four 60-sample analysis
    * frames. */
  val WavSamples = 240
  val WavFrame = 60

  final case class WavAsset(asset_id: Long, wav: Array[Byte])
  final case class DecodedAudio(asset_id: Long, n_samples: Int,
                                samples: Array[Int])

  /** Deterministic 16-bit PCM sample t for a document: the box-filtered
    * character mean over slice [⌊t·n/240⌋, ⌊(t+1)·n/240⌋), centered at
    * 96 and scaled by 256 — a text-derived "waveform" whose every value
    * both engines can recompute exactly (range ±2^15 safe: ASCII means
    * are 32..122 → samples in [-16384, 6656]). */
  def sampleLevel(text: String, t: Int): Int = {
    val n = text.length
    if (n == 0) 0
    else {
      val start = t * n / WavSamples
      val len = math.max((t + 1) * n / WavSamples - start, 1)
      var sum = 0
      var i = start
      while (i < start + len) { sum += text.charAt(i).toInt & 0xff; i += 1 }
      (sum / len - 96) * 256
    }
  }

  /** Encode each document's synthetic waveform as a REAL RIFF/WAVE file
    * via `javax.sound.sampled.AudioSystem` — 8 kHz, 16-bit signed
    * little-endian mono, genuine header + PCM chunk (any audio tool
    * would play it). The second real-codec modality next to
    * [[pngAssetTable]]. */
  def wavAssetTable(docs: DataFrame): Dataset[WavAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { batch =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          true, false) // signed, little-endian
        batch.map { case (id, text) =>
          val pcm = new Array[Byte](WavSamples * 2)
          var t = 0
          while (t < WavSamples) {
            val s = sampleLevel(text, t)
            pcm(2 * t) = (s & 0xff).toByte
            pcm(2 * t + 1) = ((s >> 8) & 0xff).toByte
            t += 1
          }
          val stream = new javax.sound.sampled.AudioInputStream(
            new ByteArrayInputStream(pcm), fmt, WavSamples.toLong)
          val out = new ByteArrayOutputStream(600)
          javax.sound.sampled.AudioSystem.write(stream,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          WavAsset(id, out.toByteArray)
        }
      }
  }

  /** Decode REAL WAV byte streams back into PCM samples — the audio
    * twin of [[decodePngPartitions]]: `AudioSystem` parses the actual
    * RIFF header and hands back the sample stream; 16-bit PCM is
    * lossless, so decoded samples are bit-exact against
    * [[sampleLevel]]. */
  def decodeWavPartitions(assets: Dataset[WavAsset]): Dataset[DecodedAudio] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      // Per-partition codec init: resolve the WAVE AudioFileReader SPI
      // provider ONCE (AudioSystem.getAudioInputStream re-scans the
      // provider registry per call — the per-clip cost the batched
      // harness exists to amortize). Same genuine javax.sound parser.
      import scala.jdk.CollectionConverters._
      val probe = {
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
          true, false)
        val stream = new javax.sound.sampled.AudioInputStream(
          new ByteArrayInputStream(new Array[Byte](2)), fmt, 1L)
        val out = new ByteArrayOutputStream(64)
        javax.sound.sampled.AudioSystem.write(stream,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        out.toByteArray
      }
      val reader = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.find { r =>
          try { r.getAudioInputStream(new ByteArrayInputStream(probe))
            .close(); true }
          catch { case _: Exception => false }
        }.getOrElse(throw new IllegalStateException(
          "no WAVE-capable AudioFileReader on this JVM"))
      batch.map { a =>
        val in = reader.getAudioInputStream(
          new ByteArrayInputStream(a.wav))
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"asset ${a.asset_id}: expected 16-bit LE PCM, got $fmt")
        val bytes = in.readAllBytes()
        val n = bytes.length / 2
        val samples = new Array[Int](n)
        var t = 0
        while (t < n) {
          samples(t) = ((bytes(2 * t + 1).toInt << 8) |
            (bytes(2 * t).toInt & 0xff))
          t += 1
        }
        DecodedAudio(a.asset_id, n, samples)
      }
    }
  }

  /** Decode REAL PNG byte streams back into pixel rasters — the
    * partition-batched decode harness with an actual codec in it.
    * 8-bit grayscale PNG is lossless, so decoded samples are bit-exact
    * against the generation formula (that equality IS the round-trip
    * test the queries hash-check). */
  def decodePngPartitions(assets: Dataset[PngAsset]): Dataset[DecodedImage] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { batch =>
      ImageIO.setUseCache(false)  // per-partition codec init lives here
      batch.map { a =>
        val img = ImageIO.read(new ByteArrayInputStream(a.png))
        require(img != null, s"asset ${a.asset_id}: not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        val px = new Array[Int](w * h)
        var j = 0
        while (j < px.length) {
          px(j) = raster.getSample(j % w, j / w, 0)
          j += 1
        }
        DecodedImage(a.asset_id, w, h, px)
      }
    }
  }
}
