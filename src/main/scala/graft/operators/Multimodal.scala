package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed batch-at-a-time per partition.
  *
  * Image decode is REAL: payloads are PNG/JPEG bytes decoded with the
  * in-JDK `javax.imageio` (no external media libraries needed), and the
  * extracted width/height/channels/mean-pixel features come from actual
  * pixels. Audio decode is REAL too: WAV/PCM payloads go through the
  * in-JDK `javax.sound.sampled` (sample rate, channels, sample count and
  * mean |amplitude| from the actual PCM frames). Only VIDEO decode remains
  * STUBBED behind [[FakeDecoder]] (the JDK genuinely ships no video
  * codec) — the Spark-side contract is identical either way: schema,
  * partition-parallel `mapPartitions` over a typed Dataset (the Scala
  * analog of Python's `mapInPandas` batch UDF), and batch-shaped output
  * rows. A corrupt or undecodable payload never fails the job: it falls
  * back to the deterministic fake and is flagged `decoded = false`.
  */
object Multimodal {

  /** A media payload row: opaque bytes + typed metadata. */
  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])

  /** Extracted feature row. For `decoded = true` image rows,
    * width/height/channels/mean_red are read from real pixels; for
    * `decoded = true` audio rows the same physical columns carry the audio
    * shape — width = sample rate, height = 0, n_frames = samples per
    * channel, mean_red = mean |amplitude| over the PCM frames (one feature
    * schema across modalities, column semantics documented per modality,
    * the usual multimodal-table convention). Otherwise values come from
    * the deterministic fake kernel (channels/mean_red 0). */
  case class MediaFeatures(doc_id: Long, modality: String, byte_len: Int,
                           width: Int, height: Int, n_frames: Int,
                           channels: Int, mean_red: Long, decoded: Boolean,
                           checksum: Long)

  /** Real image codec on the in-JDK `javax.imageio` readers (PNG/JPEG/BMP/
    * GIF). Encode exists so fixtures can be generated deterministically
    * in-cluster; decode is the production kernel. */
  object ImageCodec {
    // a temp-file cache per decode would dominate the per-row cost at
    // scale; decode fully in-memory
    ImageIO.setUseCache(false)

    case class Decoded(width: Int, height: Int, channels: Int, meanRed: Long)

    /** Solid-colour RGB PNG — byte-exact round-trip (PNG is lossless), so
      * decoded features are a pure function of (width, height, rgb). */
    def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val out = new ByteArrayOutputStream(256)
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** Decode any payload `javax.imageio` has a reader for; None when the
      * bytes are not a decodable image (corrupt row, wrong modality). */
    def decode(payload: Array[Byte]): Option[Decoded] =
      try {
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sumRed = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sumRed += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
            y += 1
          }
          Some(Decoded(w, h, img.getColorModel.getNumComponents,
            sumRed / (w.toLong * h)))
        }
      } catch { case _: Exception => None }
  }

  /** Real audio codec on the in-JDK `javax.sound.sampled` (WAV/AIFF/AU
    * containers; frames converted to signed 16-bit PCM before the feature
    * pass). Encode exists so fixtures can be generated deterministically
    * in-cluster; decode is the production kernel. */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    case class Decoded(sampleRate: Int, channels: Int, nSamples: Long,
                       meanAbs: Long)

    /** Constant-amplitude signed-16-bit mono PCM WAV — lossless container,
      * so decoded features are a pure function of
      * (sampleRate, amplitude, nSamples). */
    def encodeWav(sampleRate: Int, amplitude: Short,
                  nSamples: Int): Array[Byte] = {
      val fmt = new AudioFormat(sampleRate.toFloat, 16, 1,
        /* signed = */ true, /* bigEndian = */ false)
      val pcm = new Array[Byte](nSamples * 2)
      var i = 0
      while (i < nSamples) {
        pcm(2 * i) = (amplitude & 0xff).toByte
        pcm(2 * i + 1) = ((amplitude >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
        nSamples.toLong)
      val out = new ByteArrayOutputStream(pcm.length + 64)
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** Decode any payload `javax.sound.sampled` has a reader for; None
      * when the bytes are not decodable audio (corrupt row, wrong
      * modality). */
    def decode(payload: Array[Byte]): Option[Decoded] =
      try {
        val ais =
          AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        val target = new AudioFormat(fmt.getSampleRate, 16,
          fmt.getChannels, true, false)
        val pcm = AudioSystem.getAudioInputStream(target, ais)
        val bytes = pcm.readAllBytes()
        val n = bytes.length / 2
        var sum = 0L
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
          sum += math.abs(s.toInt)
          i += 1
        }
        Some(Decoded(fmt.getSampleRate.toInt, fmt.getChannels,
          n.toLong / fmt.getChannels, if (n == 0) 0L else sum / n))
      } catch { case _: Exception => None }
  }

  /** Deterministic fake kernel for the modality the JDK cannot decode
    * (video) and for corrupt payloads. Derives "dimensions" from
    * payload bytes so tests have stable expectations. */
  object FakeDecoder {
    def decode(payload: Array[Byte], modality: String): (Int, Int, Int) = {
      val n = payload.length
      modality match {
        case "image" => ((n % 640) + 1, (n % 480) + 1, 1)
        case "video" => ((n % 640) + 1, (n % 480) + 1, (n % 30) + 1)
        case "audio" => (0, 0, (n % 16000) + 1)
        case _       => (0, 0, 0)
      }
    }
    def checksum(payload: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      h
    }
  }

  /** The deterministic fixture image for a document: dimensions and colour
    * are pure functions of doc_id, so an oracle can predict every decoded
    * feature without running the codec. */
  private def pngFor(docId: Long): Array[Byte] = {
    val w = (docId % 64).toInt + 1
    val h = (docId % 48).toInt + 1
    val r = (docId % 256).toInt
    val g = (docId * 7 % 256).toInt
    val b = (docId * 13 % 256).toInt
    ImageCodec.encodePng(w, h, (r << 16) | (g << 8) | b)
  }

  /** The deterministic fixture WAV for a document — like [[pngFor]], every
    * decoded feature is a pure function of doc_id: sample rate 8k/16k,
    * constant amplitude doc_id % 1000 (so mean |amplitude| == amplitude),
    * doc_id % 500 + 50 mono samples. */
  private def wavFor(docId: Long): Array[Byte] =
    AudioCodec.encodeWav(
      sampleRate = 8000 + (docId % 2).toInt * 8000,
      amplitude = (docId % 1000).toShort,
      nSamples = (docId % 500).toInt + 50)

  /** Build a media table from the documents fixture with a modality
    * assigned round-robin. Image rows carry REAL PNG payloads and audio
    * rows REAL WAV payloads (generated in-cluster, deterministic per
    * doc_id); video rows carry the text bytes as an opaque stand-in
    * payload (no JDK video codec exists to decode them anyway). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast(BinaryType).as("payload"))
      .as(enc)
      .mapPartitions { rows =>
        rows.map { r =>
          r.modality match {
            case "image" => r.copy(payload = pngFor(r.doc_id))
            case "audio" => r.copy(payload = wavFor(r.doc_id))
            case _       => r
          }
        }
      }
  }

  /** All-image media table: every document becomes a real PNG payload.
    * The fixture for end-to-end pixel-exact decode checks. */
  def imageMediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    docs.select(col("doc_id"), lit("image").as("modality"),
        lit(Array.empty[Byte]).as("payload"))
      .as(enc)
      .mapPartitions(rows => rows.map(r => r.copy(payload = pngFor(r.doc_id))))
  }

  /** Partition-parallel decode/feature-extract: the batch-UDF analog.
    * Image payloads go through the real `javax.imageio` kernel and audio
    * payloads through the real `javax.sound.sampled` kernel; a decode
    * failure (corrupt bytes, unsupported format) falls back to the
    * deterministic fake and is flagged `decoded = false` instead of
    * failing the partition. Per-partition init amortizes across the batch,
    * the same contract as `mapInPandas`. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map { r =>
        val real: Option[MediaFeatures] = r.modality match {
          case "image" => ImageCodec.decode(r.payload).map(d =>
            MediaFeatures(r.doc_id, r.modality, r.payload.length,
              d.width, d.height, 1, d.channels, d.meanRed, decoded = true,
              FakeDecoder.checksum(r.payload)))
          case "audio" => AudioCodec.decode(r.payload).map(d =>
            MediaFeatures(r.doc_id, r.modality, r.payload.length,
              d.sampleRate, 0, d.nSamples.toInt, d.channels, d.meanAbs,
              decoded = true, FakeDecoder.checksum(r.payload)))
          case _ => None
        }
        real.getOrElse {
          val (w, h, f) = FakeDecoder.decode(r.payload, r.modality)
          MediaFeatures(r.doc_id, r.modality, r.payload.length, w, h, f,
            0, 0L, decoded = false, FakeDecoder.checksum(r.payload))
        }
      }
    }
  }

  /** Frame sampling for video payloads: emit one row per sampled frame
    * index (stubbed decode), demonstrating the 1->N generator shape. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): DataFrame = {
    implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt)
    media.filter(_.modality == "video").mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, _, frames) = FakeDecoder.decode(r.payload, r.modality)
        (0 until frames by everyN).map(i => (r.doc_id, i))
      }
    }.toDF("doc_id", "frame_idx")
  }
}
