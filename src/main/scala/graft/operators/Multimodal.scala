package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque binary
  * columns with typed metadata, processed batch-at-a-time per partition.
  *
  * The decode/feature-extraction kernels are STUBBED (no media libraries in
  * this environment) behind [[FakeDecoder]], a deterministic fake — but the
  * Spark-side contract is real and tested: schema, partition-parallel
  * `mapPartitions` over a typed Dataset (the Scala analog of Python's
  * `mapInPandas` batch UDF), and batch-shaped output rows. Swapping
  * [[FakeDecoder]] for a JNI/codec-backed decoder changes no plan shape.
  */
object Multimodal {

  /** A media payload row: opaque bytes + typed metadata. */
  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])

  /** Extracted feature row (what a real image/audio decoder would emit). */
  case class MediaFeatures(doc_id: Long, modality: String, byte_len: Int,
                           width: Int, height: Int, n_frames: Int,
                           checksum: Long)

  /** Deterministic fake decode kernel — stands in for e.g. JPEG decode /
    * audio resample. Derives "dimensions" from payload bytes so tests have
    * stable expectations. A production build replaces only this object. */
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

  /** Build a media table from the documents fixture: text bytes stand in
    * for the opaque payload (this environment ships no real media), with a
    * modality assigned round-robin — the schema/partitioning shape a real
    * ingest would produce. */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val enc = Encoders.product[MediaRow]
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast(BinaryType).as("payload"))
      .as(enc)
  }

  /** Partition-parallel decode/feature-extract: the batch-UDF analog.
    * Runs the (stub) kernel once per row inside `mapPartitions`, so a real
    * decoder can amortize per-batch init (model load, codec context) across
    * the partition — the same contract as `mapInPandas`. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      // per-partition init would go here (codec context, model handles)
      rows.map { r =>
        val (w, h, f) = FakeDecoder.decode(r.payload, r.modality)
        MediaFeatures(r.doc_id, r.modality, r.payload.length, w, h, f,
          FakeDecoder.checksum(r.payload))
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
