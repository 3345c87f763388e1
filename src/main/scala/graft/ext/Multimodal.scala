package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators — extension family (builder brief): treat
  * image/audio payloads as opaque `binary` columns with typed metadata,
  * and run encode / decode / feature-extraction as imperative
  * per-partition batch work over REAL formats (24-bit BMP, P6 PPM, PCM16
  * WAV — [[MediaCodecs]]; r7 VERDICT #4 retired the `FakeDecoder` stub).
  *
  * Shape: every decode runs through `mapPartitions` — the Scala analogue
  * of `mapInPandas`: one iterator per partition, so codec/model state
  * initializes once per partition, not per row. The fixtures are
  * synthesized from closed-form formulas the DuckDB oracles re-evaluate
  * independently, and the encoders plant real decode traps (bottom-up BMP
  * rows, junk row padding, junk RIFF chunks) so a sloppy decoder fails
  * the gate rather than passing vacuously.
  *
  * Scale design: encode/decode is narrow per-partition work — no shuffle;
  * the binary payloads never move except at scan. Partition sizing is
  * controlled upstream by `spark.sql.files.maxPartitionBytes` so a
  * partition of blobs fits executor memory.
  */
object Multimodal {

  /** The typed metadata carried alongside every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Raster features: header dims + pixel stats. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_px", DoubleType)))

  /** Nearest-neighbour downscale output. */
  val resizeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("orig_w", IntegerType),
    StructField("orig_h", IntegerType),
    StructField("new_w", IntegerType),
    StructField("new_h", IntegerType),
    StructField("resized_mean", DoubleType)))

  /** PCM stream stats. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_samples", LongType),
    StructField("sample_rate", IntegerType),
    StructField("rms", DoubleType),
    StructField("peak", LongType)))

  /** Per-frame PCM window stats. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("n_frame_samples", LongType),
    StructField("frame_rms", DoubleType)))

  /** Per-channel raster means (PPM's R/G/B order). */
  val channelSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** Wrap a (doc_id, text) corpus as a media table: payload = UTF-8 bytes,
    * metadata struct populated. The text-modality member of the family —
    * its byte stats run as a codegen expression
    * ([[graft.functions.ByteMean]]), no decode needed.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** Media table whose payloads are real format bytes synthesized per
    * doc_id (deterministic — the oracle recomputes expected stats from
    * the same formulas without ever seeing the bytes).
    */
  private def mediaTableOf(docs: DataFrame, mime: String,
      enc: Long => Array[Byte]): DataFrame = {
    val rowEnc = Encoders.row(mediaSchema)
    docs.select(col("doc_id"), col("source")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = enc(id)
        Row(id, payload, Row(mime, payload.length.toLong, r.getString(1)))
      }
    }(rowEnc)
  }

  def bmpTable(docs: DataFrame): DataFrame =
    mediaTableOf(docs, "image/bmp", MediaCodecs.encodeBmp)

  def wavTable(docs: DataFrame): DataFrame =
    mediaTableOf(docs, "audio/wav", MediaCodecs.encodeWav)

  def ppmTable(docs: DataFrame): DataFrame =
    mediaTableOf(docs, "image/x-portable-pixmap", MediaCodecs.encodePpm)

  def videoTable(docs: DataFrame): DataFrame =
    mediaTableOf(docs, "video/x-raw-rv1", MediaCodecs.encodeVideo)

  /** Mime-dispatched raster decode — BMP and PPM payloads in the same
    * table decode through their own codecs.
    */
  private def decodeRaster(mime: String, payload: Array[Byte]): MediaCodecs.Raster =
    mime match {
      case "image/bmp" => MediaCodecs.decodeBmp(payload)
      case "image/x-portable-pixmap" => MediaCodecs.decodePpm(payload)
      case other => throw new IllegalArgumentException(s"no raster codec for mime $other")
    }

  /** Raster feature extraction: decode each payload (header-true width /
    * height, padding-skipping pixel mean) per partition.
    */
  def extractImageFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(imageFeatureSchema)
    media.select(col("media_id"), col("payload"), col("meta.mime")).mapPartitions { rows =>
      // a heavier codec would init once per partition HERE
      rows.map { r =>
        val p = r.getAs[Array[Byte]](1)
        val raster = decodeRaster(r.getString(2), p)
        Row(r.getLong(0), p.length.toLong, raster.width, raster.height, raster.meanAll)
      }
    }(enc)
  }

  /** Real resize: decode, nearest-neighbour ×2 downscale in image
    * coordinates ([[MediaCodecs.downscale2]]), stats of the result.
    */
  def resizeHalf(media: DataFrame): DataFrame = {
    val enc = Encoders.row(resizeSchema)
    media.select(col("media_id"), col("payload"), col("meta.mime")).mapPartitions { rows =>
      rows.map { r =>
        val raster = decodeRaster(r.getString(2), r.getAs[Array[Byte]](1))
        val small = MediaCodecs.downscale2(raster)
        Row(r.getLong(0), raster.width, raster.height,
          small.width, small.height, small.meanAll)
      }
    }(enc)
  }

  /** Per-channel raster means (R/G/B). */
  def extractChannelMeans(media: DataFrame): DataFrame = {
    val enc = Encoders.row(channelSchema)
    media.select(col("media_id"), col("payload"), col("meta.mime")).mapPartitions { rows =>
      rows.map { r =>
        val raster = decodeRaster(r.getString(2), r.getAs[Array[Byte]](1))
        Row(r.getLong(0), raster.width, raster.height,
          raster.meanChannel(0), raster.meanChannel(1), raster.meanChannel(2))
      }
    }(enc)
  }

  /** Perceptual average-hash output. */
  val hashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("phash", LongType)))

  /** Average hash (the classic aHash perceptual fingerprint): decode,
    * gray = r+g+b per pixel (kept as an exact integer — no luma
    * weights, no division), partition the raster into a grid×grid
    * block lattice, bit b = 1 iff that block's mean gray EXCEEDS the
    * image mean. The comparison is cross-multiplied
    * (blockSum·totalCount > totalSum·blockCount) so the whole hash is
    * integer arithmetic end to end — bit-identical in any engine, no
    * float thresholds. Images that differ by small noise land in the
    * same bucket; a grid² hash is the image twin of SimHash's banded
    * lattice. Per-partition decode, one Row out per media row.
    */
  def averageHash(media: DataFrame, grid: Int = 2): DataFrame = {
    require(grid >= 1 && grid <= 8, "grid in [1,8] — phash fits a long")
    val enc = Encoders.row(hashSchema)
    media.select(col("media_id"), col("payload"), col("meta.mime")).mapPartitions { rows =>
      rows.map { r =>
        val raster = decodeRaster(r.getString(2), r.getAs[Array[Byte]](1))
        val w = raster.width; val h = raster.height
        val bs = new Array[Long](grid * grid)
        val bc = new Array[Long](grid * grid)
        var ts = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = raster.channel(x, y, 0) + raster.channel(x, y, 1) +
              raster.channel(x, y, 2)
            val b = (y * grid / h) * grid + (x * grid / w)
            bs(b) += g; bc(b) += 1; ts += g
            x += 1
          }
          y += 1
        }
        val tc = w.toLong * h
        var phash = 0L
        var b = 0
        while (b < grid * grid) {
          // BigInt comparison: bs·tc overflows a Long at ~10⁸ pixels
          // (765·npx² > 2⁶³) — grid² comparisons per media, so the
          // arbitrary-precision cost is noise next to the decode
          if (BigInt(bs(b)) * tc > BigInt(ts) * bc(b)) phash |= 1L << b
          b += 1
        }
        Row(r.getLong(0), w, h, phash)
      }
    }(enc)
  }

  /** Frame-sample output: one row per SAMPLED frame. */
  val frameSampleSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("gray_sum", LongType),
    StructField("phash", LongType)))

  /** Video frame sampling — the video member of the decode family:
    * decode the RV1 clip per partition (a real codec would init here
    * once per partition), keep every `every`-th frame (frame 0
    * always), and emit per sampled frame the exact integer gray mass
    * (Σ r+g+b) and the grid×grid aHash of THAT frame (the
    * [[averageHash]] integer cross-multiply applied per frame) — the
    * rows a frame-level dedup/caption pipeline consumes. The shuffle
    * carries (media_id, idx, 2 longs) per sampled frame, never pixels.
    */
  def sampleVideoFrames(media: DataFrame, every: Int = 3, grid: Int = 2): DataFrame = {
    require(every >= 1, "every >= 1")
    require(grid >= 1 && grid <= 8, "grid in [1,8]")
    val enc = Encoders.row(frameSampleSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val clip = MediaCodecs.decodeVideo(r.getAs[Array[Byte]](1))
        val w = clip.width; val h = clip.height
        (0 until clip.nFrames).filter(_ % every == 0).map { f =>
          val fr = clip.frame(f)
          val bs = new Array[Long](grid * grid)
          val bc = new Array[Long](grid * grid)
          var ts = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = fr.channel(x, y, 0) + fr.channel(x, y, 1) +
                fr.channel(x, y, 2)
              val b = (y * grid / h) * grid + (x * grid / w)
              bs(b) += g; bc(b) += 1; ts += g
              x += 1
            }
            y += 1
          }
          val tc = w.toLong * h
          var phash = 0L
          var b = 0
          while (b < grid * grid) {
            if (BigInt(bs(b)) * tc > BigInt(ts) * bc(b)) phash |= 1L << b
            b += 1
          }
          Row(r.getLong(0), f, clip.nFrames, ts, phash)
        }
      }
    }(enc)
  }

  /** Audio energy-band hash output. */
  val audioHashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_samples", LongType),
    StructField("ahash", LongType)))

  /** Audio near-dup fingerprint — the PCM twin of [[averageHash]]:
    * decode the RIFF stream, split samples into `windows` equal time
    * windows, bit w = 1 iff that window's mean |amplitude| EXCEEDS the
    * stream mean (cross-multiplied: windowSum·n > totalSum·windowLen —
    * integer arithmetic end to end, no float energies). Streams that
    * differ by low-level noise keep the same coarse energy envelope
    * and land in the same bucket.
    */
  def audioHash(media: DataFrame, windows: Int = 4): DataFrame = {
    require(windows >= 1 && windows <= 63, "windows in [1,63]")
    val enc = Encoders.row(audioHashSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val pcm = MediaCodecs.decodeWav(r.getAs[Array[Byte]](1))
        val smp = pcm.samples
        val n = smp.length
        val ws = new Array[Long](windows)
        val wc = new Array[Long](windows)
        var ts = 0L
        var i = 0
        while (i < n) {
          val a = math.abs(smp(i).toLong)
          val w = i * windows / n
          ws(w) += a; wc(w) += 1; ts += a
          i += 1
        }
        var ahash = 0L
        var w = 0
        while (w < windows) {
          // BigInt: ws·n overflows a Long at ~1.7·10⁷ samples
          // (32767·n² > 2⁶³ — a ~35 min clip at 8 kHz); bounded count
          // of comparisons per media, cost is noise next to the decode
          if (BigInt(ws(w)) * n > BigInt(ts) * wc(w)) ahash |= 1L << w
          w += 1
        }
        Row(r.getLong(0), n.toLong, ahash)
      }
    }(enc)
  }

  /** PCM stream stats: RIFF chunk walk, 16-bit sample decode, RMS/peak. */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(audioFeatureSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val pcm = MediaCodecs.decodeWav(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), pcm.samples.length.toLong, pcm.sampleRate,
          pcm.rms, pcm.peak)
      }
    }(enc)
  }

  /** Frame sampling over decoded PCM: `nFrames` equal sample windows,
    * per-window RMS — the "sample every k-th frame" batch shape running
    * on real decoded samples.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val enc = Encoders.row(frameSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val pcm = MediaCodecs.decodeWav(r.getAs[Array[Byte]](1))
        MediaCodecs.pcmFrames(pcm, nFrames).map { case (idx, n, rms) =>
          Row(id, idx, n, rms)
        }
      }
    }(enc)
  }
}
