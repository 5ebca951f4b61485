package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing (SURVEY.md §2.3 #47): opaque binary payloads with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake (documented as such) — but everything Spark-side is
  * real and load-bearing: the binary+struct schema, the typed Dataset hop,
  * the mapPartitions batch shape (one decoder init per partition, not per
  * row — exactly where a JNI codec or an ONNX session would be hoisted),
  * and the columnar return schema.
  */
object Multimodal {

  /** One blob: payload + typed metadata (what an image/audio table carries
    * at 100 TB: bytes stay opaque until a partition-local decoder runs). */
  final case class Blob(doc_id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int)

  /** Decoded features per blob. */
  final case class Decoded(doc_id: Long, n_bytes: Long, checksum: Long,
      n_pixels: Long, feat: Array[Double])

  /** Rolling hash over a byte span — the one stub "checksum" shared by the
    * whole-blob decode and the per-frame decode, so they can never drift. */
  private def hashSpan(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 1125899906842597L
    var i = from
    while (i < until) { h = h * 257L + (bytes(i) & 0xff); i += 1 }
    h
  }

  /** STUB CODEC: deterministic fake "decode" — rolling checksum + a fixed
    * 4-dim feature vector derived from payload bytes. A real deployment
    * swaps only this function (and its per-partition init) for e.g. a JNI
    * JPEG decoder; the pipeline shape does not change. */
  def decodeStub(b: Blob): Decoded = {
    val h = hashSpan(b.payload, 0, b.payload.length)
    val feat = Array(
      b.payload.length.toDouble,
      (h & 0xffff).toDouble,
      b.width.toDouble * b.height.toDouble,
      if (b.payload.nonEmpty) b.payload(0).toDouble else 0.0)
    Decoded(b.doc_id, b.payload.length.toLong, h, b.width.toLong * b.height, feat)
  }

  /** Fake blob table derived from `documents` (payload = UTF-8 bytes of the
    * text, metadata from n_chars) — stands in for an image/audio table. */
  def blobs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/raw").as("format"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))

  /** The decode pipeline: typed Dataset → mapPartitions with per-partition
    * decoder init → typed Dataset of features. Parallelism = input
    * partitioning; no shuffle is introduced by decoding. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Blob] = blobs(docs).as[Blob]
    ds.mapPartitions { it =>
      // per-partition init point (codec/session handle would live here)
      it.map(decodeStub)
    }.toDF()
      .select(col("doc_id"), col("n_bytes"), col("checksum"), col("n_pixels"),
        element_at(col("feat"), 3).as("pixel_feat"))
  }

  /** One sampled frame of a video-like blob. */
  final case class Frame(doc_id: Long, frame_idx: Long, ts_ms: Long,
      frame_bytes: Long, frame_hash: Long)

  /** Frame sampling: every `everyN`-th frame of each blob, one output row
    * per sampled frame — the fan-out a video corpus takes before
    * per-frame feature extraction. The blob's "frame count" and per-frame
    * "bytes" come from the stub codec (payload length / a fixed frame
    * stride); a real deployment swaps the demuxer in the same
    * mapPartitions hop. flatMap shape: a 1-hour 30 fps blob becomes 108k
    * rows WITHOUT materializing them driver-side, and downstream
    * repartition spreads per-frame work regardless of blob skew. */
  def sampleFrames(spark: SparkSession, docs: DataFrame, everyN: Int = 10,
      frameStride: Int = 256, fps: Int = 30): DataFrame = {
    require(everyN > 0 && frameStride > 0 && fps > 0)
    import spark.implicits._
    val ds: Dataset[Blob] = blobs(docs).as[Blob]
    ds.mapPartitions { it =>
      // per-partition init point (demuxer handle would live here)
      it.flatMap { b =>
        val nFrames = math.max(1L, b.payload.length.toLong / frameStride)
        (0L until nFrames by everyN.toLong).iterator.map { f =>
          // stub per-frame "decode": hash of the frame's byte span
          val from = (f * frameStride).toInt.min(b.payload.length)
          val until = ((f + 1) * frameStride).toInt.min(b.payload.length)
          Frame(b.doc_id, f, f * 1000L / fps, (until - from).toLong,
            hashSpan(b.payload, from, until))
        }
      }
    }.toDF()
  }
}
