package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Design per the brief: media is carried as opaque `binary` columns
  * plus typed metadata; decode/feature steps run per-partition in
  * batches (the Scala analogue of `mapInPandas` — one iterator pass,
  * no per-row task overhead). IMAGE decoding is REAL — the JDK ships
  * `javax.imageio` (PNG/JPEG/BMP/GIF) — and so is AUDIO header
  * decoding (`javax.sound.sampled`, WAV/AIFF/AU), no external
  * libraries needed for either. Only the VIDEO codec remains STUBBED
  * (no media libraries in this container) with a deterministic fake
  * that derives pseudo-dimensions/features from the bytes, clearly
  * marked below; the plumbing (schema, batching, partitioning, null
  * handling) is identical for every path.
  */
object Multimodal {

  /** Canonical media schema: (id, kind, content, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),        // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  case class DecodedImage(width: Int, height: Int, channels: Int)

  /** REAL image decoder: `javax.imageio.ImageIO` (PNG/JPEG/BMP/GIF
    * readers ship in the JDK). Null, empty, or undecodable payloads
    * come back as (0, 0, 0) — per-row decode failures must not kill a
    * 100 TB scan. Channels = the raster band count (3 for RGB PNG,
    * 4 with alpha, 1 for grayscale). */
  private[graft] def decodeImageReal(bytes: Array[Byte]): DecodedImage = {
    if (bytes == null || bytes.isEmpty) return DecodedImage(0, 0, 0)
    // NonFatal only: swallowing OutOfMemoryError/InterruptedException
    // inside an executor task would mask task cancellation or fatal
    // memory state during a large scan
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) DecodedImage(0, 0, 0)
    else DecodedImage(img.getWidth, img.getHeight, img.getRaster.getNumBands)
  }

  case class DecodedAudio(sampleRate: Int, channels: Int, frames: Long)

  /** REAL audio header decoder: `javax.sound.sampled.AudioSystem`
    * (WAV/AIFF/AU parsers ship in the JDK). Returns the sample rate,
    * channel count, and frame count from the container header —
    * payloads that aren't a supported audio container come back as
    * (0, 0, 0), like [[decodeImageReal]]'s failure contract. */
  private[graft] def decodeAudioReal(bytes: Array[Byte]): DecodedAudio = {
    if (bytes == null || bytes.isEmpty) return DecodedAudio(0, 0, 0L)
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      DecodedAudio(aff.getFormat.getSampleRate.toInt, aff.getFormat.getChannels,
        aff.getFrameLength.toLong)
    } catch { case scala.util.control.NonFatal(_) => DecodedAudio(0, 0, 0L) }
  }

  /** Decode + attach audio header fields, batched per partition.
    * Output adds (sample_rate, channels, frames); non-audio kinds get
    * zeros (a mixed-media relation routes by `kind`). */
  def decodeAudio(media: DataFrame): DataFrame = {
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
      StructField("frames", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val d =
          if (r.getAs[String]("kind") == "audio")
            decodeAudioReal(r.getAs[Array[Byte]]("content"))
          else DecodedAudio(0, 0, 0L)
        Row.fromSeq(r.toSeq ++ Seq[Any](d.sampleRate, d.channels, d.frames))
      }
    }(enc)
  }

  /** STUB decoder for the non-image kinds. A production build replaces
    * this with an actual codec (ffmpeg bindings); the deterministic
    * fake keeps the pipeline testable and reproducible: dimensions are
    * derived from a stable hash of the payload. */
  private[graft] def decodeImageStub(bytes: Array[Byte]): DecodedImage = {
    if (bytes == null || bytes.isEmpty) return DecodedImage(0, 0, 0)
    val h = java.util.Arrays.hashCode(bytes)
    DecodedImage(64 + math.abs(h % 512), 64 + math.abs((h >> 9) % 512), 3)
  }

  /** Decode + attach dimensions, batched per partition. Output adds
    * (width, height, channels) columns. `kind = image` rows go through
    * the real ImageIO decoder; other kinds keep the declared stub. */
  def decodeImages(media: DataFrame): DataFrame = {
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("channels", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val d =
          if (r.getAs[String]("kind") == "image") decodeImageReal(bytes)
          else decodeImageStub(bytes)
        Row.fromSeq(r.toSeq ++ Seq(d.width, d.height, d.channels))
      }
    }(enc)
  }

  /** Deterministic fake feature extractor: a `dim`-length float vector
    * from a rolling hash of the payload — the plumbing (array column,
    * batch iteration, downstream ANN compatibility) is real; the
    * features are the STUB. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val schema = StructType(media.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("content")
        val feats = new Array[Float](dim)
        if (bytes != null) {
          var h = 1125899906842597L
          var i = 0
          while (i < bytes.length) {
            h = 31 * h + bytes(i)
            feats(i % dim) += (h % 1000) / 1000.0f
            i += 1
          }
        }
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling stub for video payloads: emits `n` (frame_idx,
    * frame_bytes) rows per video by slicing the payload — models the
    * explode shape of real frame extraction. */
  def sampleFrames(media: DataFrame, n: Int = 3): DataFrame = {
    val df = media.filter(col("kind") === "video")
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("frame_bytes", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = Option(r.getAs[Array[Byte]]("content")).getOrElse(Array.emptyByteArray)
        val step = math.max(1, bytes.length / math.max(1, n))
        (0 until math.min(n, math.max(1, bytes.length))).iterator.map { i =>
          val start = i * step
          val end = math.min(bytes.length, start + step)
          Row.fromSeq(r.toSeq ++ Seq(i, bytes.slice(start, end)))
        }
      }
    }(enc)
  }
}
