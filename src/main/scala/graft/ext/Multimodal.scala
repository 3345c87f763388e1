package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing — extension family (builder brief): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction as imperative
  * per-partition batch work.
  *
  * The actual media decode is STUBBED (this container has no image/audio
  * libraries — builder brief): [[FakeDecoder.decode]] is a clearly-marked
  * deterministic fake. Everything Spark-side is real and tested: the
  * binary+metadata schema, the `mapPartitions` batch shape (the Scala
  * analogue of `mapInPandas` — one iterator per partition, so a real
  * decoder would amortize model/codec init per partition, not per row),
  * and the feature schema that comes back out.
  *
  * Scale design: decode is narrow per-partition work — no shuffle; the
  * binary payloads never move except at scan. Partition sizing is
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

  /** Features produced by the (stubbed) decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("mean_byte", DoubleType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a (doc_id, text) corpus as a media table: payload = UTF-8 bytes,
    * metadata struct populated. Stands in for an image/audio scan whose
    * payload column is `binary` with the same plumbing.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        col("source").as("source")).as("meta"))

  /** STUB decoder — deterministic fake in place of a real codec (no media
    * libs in this container; builder brief). A real implementation would
    * decode `payload` per its `mime` and emit genuine features. The fake
    * derives: byte count, mean byte value, and fake "dimensions" from the
    * payload length — all deterministic, so the pipeline is testable.
    */
  object FakeDecoder {
    def decode(mediaId: Long, payload: Array[Byte]): Row = {
      val n = payload.length.toLong
      val mean = if (n == 0) 0.0 else payload.map(b => (b & 0xff).toLong).sum.toDouble / n
      // fake dims: pretend the payload is a square-ish raster
      val w = math.max(1, math.sqrt(n.toDouble).toInt)
      val h = math.max(1, (n / math.max(1, w)).toInt)
      Row(mediaId, n, mean, w, h)
    }
  }

  /** Frame sampling: split each payload into `nFrames` fixed-length byte
    * windows (the video/audio "sample every k-th frame" batch shape) and
    * emit per-frame stats. Pure codegen expressions — `substring` works on
    * binary — so sampling runs at scan speed; a real decoder would replace
    * the byte-window arithmetic with codec frame indices.
    * Output: (media_id, frame_idx, n_frame_bytes, frame_mean).
    *
    * CONTRACT (r2 ADVICE): `frame_mean` assumes ASCII payloads — the
    * windows are sliced by BYTE, but the mean is computed by casting the
    * window to string and reading character codes, which diverges from the
    * true byte mean when a window splits a multibyte UTF-8 sequence. The
    * stub media fixtures are ASCII by construction ([[asMediaTable]] over
    * the synthetic corpus); a real decoder replaces this stat with decoded
    * frame features, so the byte/char distinction dies with the stub.
    */
  def sampleFrames(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val n = octet_length(col("payload"))
    val flen = expr(s"octet_length(payload) div $nFrames")
    media
      .filter(n >= nFrames)
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), lit(nFrames - 1))).as("frame_idx"))
      .withColumn("frame", expr(
        s"substring(payload, frame_idx * (octet_length(payload) div $nFrames) + 1, " +
          s"octet_length(payload) div $nFrames)"))
      .select(
        col("media_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("n_frame_bytes"),
        (aggregate(
          transform(sequence(lit(1), octet_length(col("frame"))),
            i => ascii(substr(col("frame").cast("string"), i, lit(1))).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double") /
          octet_length(col("frame"))).as("frame_mean"))
  }

  /** Resize STUB: stride decimation — keep every `stride`-th byte and
    * emit size/mean stats of the "resized" payload (a real implementation
    * replaces the byte picks with decoded-raster interpolation; the
    * Spark-side shape — narrow per-row expressions over binary, scalar
    * stats out — is what survives the swap). Same ASCII contract as
    * [[sampleFrames]]. Output: (media_id, orig_bytes, resized_bytes,
    * resized_mean).
    */
  def resizeStride(media: DataFrame, stride: Int = 4): DataFrame = {
    val n = octet_length(col("payload"))
    val txt = col("payload").cast("string")
    val picks = transform(
      sequence(lit(1), (n / lit(stride)).cast("int")),
      i => ascii(substr(txt, (i - 1) * stride + 1, lit(1))).cast("long"))
    media.select(
      col("media_id"),
      n.cast("long").as("orig_bytes"),
      size(picks).cast("long").as("resized_bytes"),
      round(
        aggregate(picks, lit(0L), (a, x) => a + x).cast("double") /
          greatest(size(picks), lit(1)), 6).as("resized_mean"))
  }

  /** Feature extraction over the media table via `mapPartitions` — the
    * batch-per-partition shape a real decoder needs (codec init once per
    * partition, then stream the rows).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        // real decoder would init codec/model HERE, once per partition
        rows.map { r =>
          FakeDecoder.decode(r.getLong(0), r.getAs[Array[Byte]](1))
        }
      }(enc)
  }
}
