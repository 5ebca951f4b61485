package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing (SURVEY.md §2.3 #47): opaque binary payloads with
  * typed metadata, decoded/feature-extracted per partition.
  *
  * Formats with a JDK-stdlib codec (PNG/BMP/GIF via `javax.imageio`) get a
  * REAL decode — actual pixel dimensions and luminance statistics; other
  * formats (JPEG variants without a reader here, audio, video) fall back to
  * `decodeStub`, a deterministic fake documented as such. Either way the
  * Spark side is identical and load-bearing: the binary+struct schema, the
  * typed Dataset hop, the mapPartitions batch shape (one decoder init per
  * partition, not per row — where a JNI codec or an ONNX session would be
  * hoisted), and the columnar return schema.
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

  /** REAL CODEC for formats the JDK decodes natively (PNG, BMP, GIF):
    * actual raster dimensions plus sampled luminance mean — the "feature
    * extract" a vision-data pipeline runs before filtering/dedup. Pixel
    * sampling is a deterministic stride capped at ~4096 samples so a
    * pathological 100-megapixel payload costs bounded CPU per row. None on
    * undecodable bytes (caller falls back to the stub — a corrupt image
    * must not fail a 100 TB scan). */
  // in-memory decode: the default ImageIO cache spools every non-file
  // stream through a temp file — one create/write/delete per ROW inside
  // the mapPartitions hot loop. JVM-wide setting, executor-side safe.
  javax.imageio.ImageIO.setUseCache(false)

  def decodeImage(b: Blob): Option[Decoded] = {
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val n = w.toLong * h
        // sampling stride made coprime with the width: a stride sharing a
        // factor with w (every power-of-two image) would revisit the same
        // 1-2 pixel COLUMNS forever and the "mean" would see only them
        var stride = math.max(1L, n / 4096L)
        def gcd(a0: Long, b0: Long): Long = {
          var a = a0; var b = b0
          while (b != 0L) { val t = a % b; a = b; b = t }
          a
        }
        while (gcd(stride, w.toLong) != 1L) stride += 1L
        var i = 0L
        var sum = 0.0
        var cnt = 0L
        while (i < n) {
          val rgb = img.getRGB((i % w).toInt, (i / w).toInt)
          sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
          cnt += 1
          i += stride
        }
        val mean = if (cnt > 0) sum / cnt else 0.0
        Some(Decoded(b.doc_id, b.payload.length.toLong,
          hashSpan(b.payload, 0, b.payload.length), n,
          Array(w.toDouble, h.toDouble, mean, cnt.toDouble)))
      }
    } catch { case _: Exception => None }
  }

  /** Formats [[decodeImage]] handles; everything else takes the stub.
    * JPEG is here because javax.imageio ships a native JPEG reader and real
    * corpora are JPEG-first; a corrupt JPEG still falls back to the stub
    * via decodeImage's None. */
  private val ImageFormats =
    Set("image/png", "image/bmp", "image/gif", "image/jpeg", "image/jpg")

  /** Dispatch: real codec for stdlib-decodable images, stub otherwise. */
  def decodeAny(b: Blob): Decoded =
    if (ImageFormats.contains(b.format)) decodeImage(b).getOrElse(decodeStub(b))
    else decodeStub(b)

  /** Fake blob table derived from `documents` (payload = UTF-8 bytes of the
    * text, metadata from n_chars) — stands in for an image/audio table. */
  def blobs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("fake/raw").as("format"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))

  /** The decode pipeline over an arbitrary blob table: typed Dataset →
    * mapPartitions with per-partition decoder init → typed Dataset of
    * features. Parallelism = input partitioning; no shuffle is introduced
    * by decoding. Real codec for PNG/BMP/GIF, stub for the rest. */
  def decodeMetaBlobs(spark: SparkSession, blobDf: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Blob] = blobDf.as[Blob]
    ds.mapPartitions { it =>
      // per-partition init point (codec/session handle would live here)
      it.map(decodeAny)
    }.toDF()
      .select(col("doc_id"), col("n_bytes"), col("checksum"), col("n_pixels"),
        element_at(col("feat"), 3).as("pixel_feat"))
  }

  /** decodeMetaBlobs over the documents-derived fake blob table (the
    * oracle-checked query face; payloads are text bytes → stub codec). */
  def decodeMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeMetaBlobs(spark, blobs(docs))

  /** Deterministic REAL-PNG blob table derived from `documents` (dims from
    * n_chars as in [[blobs]], solid fill colored by doc_id): the vision
    * stand-in when a face needs payloads an actual codec can decode. */
  def syntheticPngBlobs(spark: SparkSession, docs: DataFrame,
      stripe: Boolean = false): DataFrame = {
    import spark.implicits._
    val meta = docs.select(col("doc_id"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))
      .as[(Long, Int, Int)]
    meta.mapPartitions { it =>
      it.map { case (id, w, h) =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = ((id * 2654435761L) & 0xffffffL).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        // stripe mode paints row 0 white on every 3rd image so
        // channel sums differ from the fill color — the pixel-stats
        // oracle derives both terms analytically from doc_id (id % 3:
        // the callers sample ids divisible by 20, so an % 4 gate would
        // fire on EVERY sampled image and the no-stripe branch would
        // never run)
        if (stripe && id % 3 == 0) {
          var x = 0
          while (x < w) { img.setRGB(x, 0, 0xffffff); x += 1 }
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Blob(id, bos.toByteArray, "image/png", w, h)
      }
    }.toDF()
  }

  /** One decoded image's exact channel sums. */
  final case class PixelStats(doc_id: Long, n_pixels: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Per-channel PIXEL SUMS through the REAL decode path — the feature
    * the brightness/contrast QA filters of an image corpus reduce to.
    * Sums, not means: they stay BIGINT-exact (a mean would divide), and
    * the caller derives any moment from them. A payload that fails to
    * decode contributes the all-zero row (the resizeBlobs passthrough
    * convention). Pixels never shuffle — one map partition pass. */
  def pixelStats(spark: SparkSession, blobDf: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Blob] = blobDf.as[Blob]
    ds.mapPartitions { it =>
      it.map { b =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.payload))
          catch { case _: Exception => null }
        if (img == null) PixelStats(b.doc_id, 0L, 0L, 0L, 0L)
        else {
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          PixelStats(b.doc_id, img.getWidth.toLong * img.getHeight,
            sr, sg, sb)
        }
      }
    }.toDF()
  }

  /** One resized blob: original and output geometry plus the re-encoded
    * payload size (the payload itself stays an opaque binary column). */
  final case class Resized(doc_id: Long, in_w: Int, in_h: Int,
      out_w: Int, out_h: Int, out_bytes: Long, payload: Array[Byte])

  /** Aspect-preserving fit of (w, h) into a maxDim box with INTEGER
    * arithmetic — max(1, dim * maxDim / longest) — so the target geometry
    * is reproducible by any engine doing integer division (the oracle
    * mirrors it); no-op when the image already fits. */
  def fitDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val longest = math.max(w, h)
    if (longest <= maxDim) (w, h)
    else (math.max(1, w * maxDim / longest), math.max(1, h * maxDim / longest))
  }

  /** REAL raster resize: decode, aspect-preserving bilinear scale into a
    * `maxDim` box, re-encode PNG — the normalization pass a vision corpus
    * runs before feature extraction, as a mapPartitions hop (one codec
    * per partition, no shuffle). Undecodable payloads pass through
    * untouched with their metadata dims (a corrupt image must not fail a
    * 100 TB scan); already-fitting images re-encode without scaling. */
  def resizeBlobs(spark: SparkSession, blobDf: DataFrame, maxDim: Int = 16): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Blob] = blobDf.as[Blob]
    ds.mapPartitions { it =>
      // per-partition init point (codec handle would live here)
      it.map { b =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.payload))
          catch { case _: Exception => null }
        if (img == null)
          Resized(b.doc_id, b.width, b.height, b.width, b.height,
            b.payload.length.toLong, b.payload)
        else {
          val (ow, oh) = fitDims(img.getWidth, img.getHeight, maxDim)
          val out = new java.awt.image.BufferedImage(ow, oh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, ow, oh, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          val bytes = bos.toByteArray
          Resized(b.doc_id, img.getWidth, img.getHeight, ow, oh,
            bytes.length.toLong, bytes)
        }
      }
    }.toDF()
  }

  /** One sampled frame of a video-like blob. */
  final case class Frame(doc_id: Long, frame_idx: Long, ts_ms: Long,
      frame_bytes: Long, frame_hash: Long)

  /** Content hash of a decoded raster: rolling hash over RGB values on a
    * deterministic stride capped at ~4096 samples (coprime with the width
    * so power-of-two rasters don't degenerate to 1-2 columns — same trick
    * as [[decodeImage]]). Two frames with different pixels hash apart;
    * re-decoding the same frame is bit-stable. */
  private def rasterHash(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val n = w.toLong * img.getHeight
    var stride = math.max(1L, n / 4096L)
    def gcd(a0: Long, b0: Long): Long = {
      var a = a0; var b = b0
      while (b != 0L) { val t = a % b; a = b; b = t }
      a
    }
    while (gcd(stride, w.toLong) != 1L) stride += 1L
    var h = 1125899906842597L
    var i = 0L
    while (i < n) {
      h = h * 257L + (img.getRGB((i % w).toInt, (i / w).toInt) & 0xffffff)
      i += stride
    }
    h
  }

  /** REAL frame demux for animated GIF (the one multi-frame container the
    * JDK decodes natively — the video stand-in): every `everyN`-th frame
    * is decoded to its true raster; `ts_ms` accumulates the per-frame
    * GraphicControlExtension delays (centiseconds) across ALL frames, so a
    * sampled frame's timestamp is its real presentation time; `frame_hash`
    * hashes decoded PIXELS, not payload bytes; `frame_bytes` is the
    * decoded ARGB raster size. None on undecodable bytes → caller falls
    * back to the stub (a corrupt video must not fail a 100 TB scan). */
  def sampleGifFrames(b: Blob, everyN: Int): Option[Seq[Frame]] = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b.payload))
      // close the stream on EVERY exit (early returns included): a
      // default file-cached ImageInputStream left to GC finalization
      // accumulates temp files/descriptors across a large executor scan
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        reader.setInput(iis, false, false)
        try {
          val n = reader.getNumImages(true)
          if (n <= 0) return None
          val out = scala.collection.mutable.ArrayBuffer.empty[Frame]
          var tsMs = 0L
          var i = 0
          while (i < n) {
            if (i % everyN == 0) {
              val img = reader.read(i)
              out += Frame(b.doc_id, i.toLong, tsMs,
                4L * img.getWidth * img.getHeight, rasterHash(img))
            }
            tsMs += 10L * frameDelayCs(reader, i)
            i += 1
          }
          Some(out.toSeq)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** GIF per-frame delay in centiseconds from the frame's
    * GraphicControlExtension (0 when absent/unreadable). */
  private def frameDelayCs(reader: javax.imageio.ImageReader, i: Int): Int =
    try {
      val tree = reader.getImageMetadata(i)
        .getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val gce = tree.getElementsByTagName("GraphicControlExtension")
      if (gce.getLength == 0) 0
      else gce.item(0).asInstanceOf[org.w3c.dom.Element]
        .getAttribute("delayTime").toInt
    } catch { case _: Exception => 0 }

  /** Frame sampling: every `everyN`-th frame of each blob, one output row
    * per sampled frame — the fan-out a video corpus takes before
    * per-frame feature extraction. GIF payloads go through the REAL
    * demuxer above (true rasters, true presentation times); other formats
    * take the stub (frame count = payload length / a fixed stride,
    * per-frame hash over the byte span), with corrupt GIFs falling back to
    * the stub rather than failing the scan. flatMap shape: a 1-hour 30 fps
    * blob becomes 108k rows WITHOUT materializing them driver-side, and
    * downstream repartition spreads per-frame work regardless of blob
    * skew. */
  def sampleFrames(spark: SparkSession, docs: DataFrame, everyN: Int = 10,
      frameStride: Int = 256, fps: Int = 30): DataFrame =
    sampleFrameBlobs(spark, blobs(docs), everyN, frameStride, fps)

  /** [[sampleFrames]] over an arbitrary blob table. */
  def sampleFrameBlobs(spark: SparkSession, blobDf: DataFrame,
      everyN: Int = 10, frameStride: Int = 256, fps: Int = 30): DataFrame = {
    require(everyN > 0 && frameStride > 0 && fps > 0)
    import spark.implicits._
    val ds: Dataset[Blob] = blobDf.as[Blob]
    val GifFormats = Set("image/gif", "video/gif")
    ds.mapPartitions { it =>
      // per-partition init point (demuxer handle would live here)
      it.flatMap { b =>
        val real =
          if (GifFormats.contains(b.format)) sampleGifFrames(b, everyN) else None
        real.map(_.iterator).getOrElse {
          val nFrames = math.max(1L, b.payload.length.toLong / frameStride)
          (0L until nFrames by everyN.toLong).iterator.map { f =>
            // stub per-frame "decode": hash of the frame's byte span
            val from = (f * frameStride).toInt.min(b.payload.length)
            val until = ((f + 1) * frameStride).toInt.min(b.payload.length)
            Frame(b.doc_id, f, f * 1000L / fps, (until - from).toLong,
              hashSpan(b.payload, from, until))
          }
        }
      }
    }.toDF()
  }

  // ------------------------------------------------------------------
  // Audio modality — WAV/PCM demux via javax.sound.sampled (JDK stdlib)
  // ------------------------------------------------------------------

  /** Decoded audio features: header-reported geometry plus a
    * stride-sampled amplitude content hash. `duration_ms` is integer
    * arithmetic (n_frames × 1000 / sample_rate, floor) so the value is
    * reproducible by any engine. A stub row (sample_rate = 0, n_frames =
    * payload length, hash over raw bytes) marks an undecodable payload —
    * corrupt audio must not fail a 100 TB scan. */
  final case class AudioMeta(doc_id: Long, sample_rate: Long, channels: Long,
      bits: Long, n_frames: Long, duration_ms: Long, amp_hash: Long)

  /** REAL WAV demux: container/format geometry from the RIFF header via
    * `AudioSystem`, amplitude hash over the decoded PCM bytes on a
    * deterministic stride capped at ~4096 samples (bounded CPU per row no
    * matter the clip length). None on undecodable bytes. */
  def decodeWav(b: Blob): Option[AudioMeta] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b.payload))
      try {
        val f = ais.getFormat
        val nFrames = ais.getFrameLength
        val sr = f.getSampleRate.toLong
        if (nFrames < 0 || sr <= 0) return None
        val pcm = ais.readAllBytes()
        val bytesPerSample = math.max(1, f.getSampleSizeInBits / 8)
        val nSamples = pcm.length.toLong / bytesPerSample
        val stride = math.max(1L, nSamples / 4096L)
        var h = 1125899906842597L
        var i = 0L
        while (i < nSamples) {
          // fold the full sample's bytes so quiet-vs-loud clips differ in
          // more than their low-order byte
          var j = 0
          val base = i * bytesPerSample
          while (j < bytesPerSample) {
            h = h * 257L + (pcm((base + j).toInt) & 0xff)
            j += 1
          }
          i += stride
        }
        Some(AudioMeta(b.doc_id, sr, f.getChannels.toLong,
          f.getSampleSizeInBits.toLong, nFrames,
          nFrames * 1000L / sr, h))
      } finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Dispatch with the corrupt-bytes-passthrough contract: real demux for
    * WAV payloads, payload-derived stub otherwise. */
  def decodeAudioAny(b: Blob): AudioMeta =
    decodeWav(b).getOrElse(AudioMeta(b.doc_id, 0L, 0L, 0L,
      b.payload.length.toLong, 0L, hashSpan(b.payload, 0, b.payload.length)))

  /** Audio metadata extraction over an arbitrary blob table — the same
    * mapPartitions shape as [[decodeMetaBlobs]] (per-partition decoder
    * init, no shuffle introduced). */
  def audioMetaBlobs(spark: SparkSession, blobDf: DataFrame): DataFrame = {
    import spark.implicits._
    val ds: Dataset[Blob] = blobDf.as[Blob]
    ds.mapPartitions { it =>
      // per-partition init point (codec handle would live here)
      it.map(decodeAudioAny)
    }.toDF()
  }

  /** Chromaprint-style energy-delta fingerprint over REALLY-DECODED PCM:
    * 16 equal sample windows, E_w = Σ|s| (int64), bit w set iff
    * E_w > E_{w−1}. Pure integer arithmetic end-to-end, so an oracle can
    * recompute the fingerprint from a generator's closed form while
    * Spark must recover it through an actual RIFF demux — a green row
    * certifies the DECODE path, not just the header walk ([[decodeWav]]'s
    * amp_hash stays engine-own; this is the cross-engine-exact audio
    * CONTENT signature, the audio analogue of the image dHash). fp = −1
    * marks an undecodable/non-16-bit payload (scan-survival contract). */
  final case class AudioFp(doc_id: Long, n_samples: Long, fp: Long)

  def audioFingerprint(b: Blob): AudioFp = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b.payload))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian)
          return AudioFp(b.doc_id, 0L, -1L)
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        if (n == 0) return AudioFp(b.doc_id, 0L, -1L)
        val e = new Array[Long](16)
        var i = 0
        while (i < n) {
          val s = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)
          e(((i.toLong * 16L) / n).toInt) += math.abs(s)
          i += 1
        }
        var fp = 0L
        var w = 1
        while (w < 16) {
          if (e(w) > e(w - 1)) fp |= (1L << w)
          w += 1
        }
        AudioFp(b.doc_id, n.toLong, fp)
      } finally ais.close()
    } catch { case _: Exception => AudioFp(b.doc_id, 0L, -1L) }
  }

  /** Fingerprints over a blob table — same mapPartitions shape as
    * [[audioMetaBlobs]] (per-partition decoder init, no shuffle). */
  def audioFingerprintBlobs(spark: SparkSession, blobDf: DataFrame): DataFrame = {
    import spark.implicits._
    blobDf.as[Blob].mapPartitions(_.map(audioFingerprint)).toDF()
  }

  /** Deterministic REAL-WAV blob table derived from `documents`: 16-bit
    * little-endian PCM, geometry from doc metadata (sample rate cycles
    * {8000, 16000, 32000} by doc_id, mono/stereo by doc_id parity, frame
    * count from n_chars), samples a fixed integer function of (doc_id,
    * index). The audio stand-in when a face needs payloads an actual
    * demuxer can parse — the oracle mirrors the INTEGER geometry from the
    * documents table while Spark must recover it by really decoding. */
  /** One VAD row: frame accounting of a decoded clip. `first_active` is
    * the first active frame index (−1 when all silence); `n_segments`
    * counts silence→speech transitions (active runs). */
  final case class Vad(doc_id: Long, n_frames: Long, n_active: Long,
      first_active: Long, n_segments: Long, active_bp: Long)

  /** ENERGY-BASED VOICE ACTIVITY DETECTION over the REAL decoded PCM —
    * the segmentation hop an audio corpus runs before any transcription
    * or captioning: cut the clip into fixed `frameSamples` frames, a
    * frame is ACTIVE when its summed |amplitude| exceeds `threshold` per
    * sample (integer compare — sum > threshold·len, no division), then
    * roll frames into activity share and speech-segment count. 16-bit
    * little-endian mono PCM; an undecodable or non-conforming payload
    * yields the n_frames = −1 stub row (a corrupt clip must not fail a
    * 100 TB scan). */
  def vad(b: Blob, frameSamples: Int = 32, threshold: Long = 1000L): Vad = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(b.payload))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian ||
          f.getChannels != 1)
          return Vad(b.doc_id, -1L, 0L, -1L, 0L, 0L)
        val pcm = ais.readAllBytes()
        val n = pcm.length / 2
        if (n == 0) return Vad(b.doc_id, -1L, 0L, -1L, 0L, 0L)
        val nFrames = (n + frameSamples - 1) / frameSamples
        var nActive = 0L
        var firstActive = -1L
        var segments = 0L
        var prevActive = false
        var fIdx = 0
        while (fIdx < nFrames) {
          val start = fIdx * frameSamples
          val end = math.min(start + frameSamples, n)
          var sum = 0L
          var i = start
          while (i < end) {
            val s = (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)
            sum += math.abs(s)
            i += 1
          }
          val active = sum > threshold * (end - start)
          if (active) {
            nActive += 1
            if (firstActive < 0) firstActive = fIdx.toLong
            if (!prevActive) segments += 1
          }
          prevActive = active
          fIdx += 1
        }
        Vad(b.doc_id, nFrames.toLong, nActive, firstActive, segments,
          10000L * nActive / nFrames)
      } finally ais.close()
    } catch { case _: Exception => Vad(b.doc_id, -1L, 0L, -1L, 0L, 0L) }
  }

  /** VAD over a blob table — same mapPartitions shape as
    * [[audioMetaBlobs]] (per-partition decode, no shuffle; frames never
    * leave the executor). */
  def vadBlobs(spark: SparkSession, blobDf: DataFrame,
      frameSamples: Int = 32, threshold: Long = 1000L): DataFrame = {
    import spark.implicits._
    blobDf.as[Blob].mapPartitions(
      _.map(vad(_, frameSamples, threshold))).toDF()
  }

  /** Speech-shaped synthetic clips for the VAD face: MONO 16-bit WAVs
    * whose 32-sample frames alternate SILENCE (even frame index) and
    * the deterministic amplitude pattern of [[syntheticWavBlobs]] (odd
    * frames) — so activity share, first-active frame and segment count
    * are all live signal with a closed-form oracle. */
  def syntheticSpeechWavBlobs(spark: SparkSession, docs: DataFrame)
      : DataFrame = {
    import spark.implicits._
    val meta = docs.select(col("doc_id"),
      (col("n_chars") % 256 + 64).cast("int").as("nf"))
      .as[(Long, Int)]
    meta.mapPartitions { it =>
      it.map { case (id, nf) =>
        val sr = Array(8000, 16000, 32000)((id % 3).toInt)
        val pcm = new Array[Byte](nf * 2)
        var i = 0
        while (i < nf) {
          val s =
            if ((i / 32) % 2 == 0) 0
            else (((id * 31 + i * 17) % 65536) - 32768).toInt
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sr.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nf.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Blob(id, bos.toByteArray, "audio/wav", 0, 0)
      }
    }.toDF()
  }

  def syntheticWavBlobs(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val meta = docs.select(col("doc_id"),
      (col("n_chars") % 256 + 64).cast("int").as("nf"))
      .as[(Long, Int)]
    meta.mapPartitions { it =>
      it.map { case (id, nf) =>
        val sr = Array(8000, 16000, 32000)((id % 3).toInt)
        val channels = (id % 2).toInt + 1
        val pcm = new Array[Byte](nf * 2 * channels)
        var i = 0
        while (i < nf * channels) {
          val s = (((id * 31 + i * 17) % 65536) - 32768).toInt
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          sr.toFloat, 16, channels, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nf.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Blob(id, bos.toByteArray, "audio/wav", 0, 0)
      }
    }.toDF()
  }

  // ------------------------------------------------------------------
  // Perceptual image hashing (dHash) — the vision-corpus near-dup
  // signature, the image analogue of text SimHash
  // ------------------------------------------------------------------

  /** One perceptual-hash row: doc_id + 64-bit dHash signature. */
  final case class PHash(doc_id: Long, sh: Long)

  /** 64-bit difference hash of a decoded raster: bilinear-downscale to
    * 9×8, integer luminance (299r+587g+114b — no float rounding in the
    * bit decision), bit(r,c) = lum(r,c+1) > lum(r,c) row-major. Robust to
    * re-encoding, uniform brightness shifts and small local edits — the
    * properties that make it THE standard near-dup signature for image
    * corpora (global structure survives, so two crops of the same photo
    * collide within a few bits while unrelated photos sit near hamming
    * 32). */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val out = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 9, 8, null)
    } finally g.dispose()
    def lum(x: Int, y: Int): Int = {
      val rgb = out.getRGB(x, y)
      299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)
    }
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lum(x + 1, y) > lum(x, y)) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Per-blob 64-bit dHash signatures (doc_id, sh) — decode +
    * downscale-to-9×8 per partition (one codec init point, no shuffle);
    * undecodable payloads drop (a corrupt image must not fail a 100 TB
    * scan, and a byte-level fallback hash would poison the hamming space
    * with signatures that mean nothing perceptually). */
  def dHashBlobs(spark: SparkSession, blobDf: DataFrame): DataFrame = {
    import spark.implicits._
    blobDf.as[Blob].mapPartitions { it =>
      // per-partition init point (codec handle would live here)
      it.flatMap { b =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.payload))
          catch { case _: Exception => null }
        if (img == null) None else Some(PHash(b.doc_id, dHash(img)))
      }
    }.toDF()
  }

  /** Perceptual near-dup pairs over a blob table: dHash signatures ride
    * the SAME Manku pigeonhole machinery as text SimHash
    * ([[graft.operators.Dedup.pigeonholePairs]]) — C(nBlocks, nBlocks −
    * maxHamming) banded tables, exact bit_count(xor) verification, never
    * O(n²). At 100 TB the signature step is a map-only decode pass and
    * the join shuffles 4-long rows, not pixels. */
  def phashNearDup(spark: SparkSession, blobDf: DataFrame,
      maxHamming: Int = 5, nBlocks: Int = 8): DataFrame =
    Dedup.pigeonholePairs(dHashBlobs(spark, blobDf), maxHamming, nBlocks)

  /** Per-image features for the composed multimodal pipeline, from ONE
    * real decode: the 64-bit dHash (candidate generation), the full
    * luminance raster as an int array (exact near-dup VERIFICATION), and
    * its total. PNG decode is LOSSLESS, so for a generated corpus these
    * values equal the generator's closed form — which is how the
    * `pipeline_mm_corpus` oracle certifies the decode sample-for-sample
    * (the mm_audio_fp discipline). At 100 TB the raster column would be
    * a bounded thumbnail; here sources are 32×24 so the full raster IS
    * the thumbnail. */
  final case class ImgFeat(doc_id: Long, sh: Long, pix: Array[Int],
      lum_sum: Long)

  def decodeFeatures(spark: SparkSession, blobDf: DataFrame): DataFrame = {
    import spark.implicits._
    blobDf.as[Blob].mapPartitions { it =>
      // per-partition init point (codec handle would live here)
      it.flatMap { b =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.payload))
          catch { case _: Exception => null }
        if (img == null) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val pix = new Array[Int](w * h)
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = img.getRGB(x, y) & 0xff
              pix(y * w + x) = v
              sum += v
              x += 1
            }
            y += 1
          }
          Some(ImgFeat(b.doc_id, dHash(img), pix, sum))
        }
      }
    }.toDF()
  }

  /** Exact masked-pixel VERIFY over pigeonhole candidates: joins each
    * (da, db) pair to its rasters and keeps pairs whose L1 distance —
    * ignoring pixels that are 255 in EITHER raster, i.e. the planted
    * local edits — is at most `maxMaskedL1`. Pure higher-order-function
    * arithmetic (zip_with + aggregate), no UDF; the join ships
    * candidate-count × raster-length ints, never re-decodes. This is the
    * LSH-candidates → exact-verify shape every near-dup family here uses
    * (dd_minhash_lsh → edit-distance verify, simhash → exact hamming). */
  def verifyNearDupPairs(cands: DataFrame, feats: DataFrame,
      maxMaskedL1: Long): DataFrame =
    cands
      .join(feats.select(col("doc_id").as("da"), col("pix").as("__pa")), "da")
      .join(feats.select(col("doc_id").as("db"), col("pix").as("__pb")), "db")
      .withColumn("masked_l1", aggregate(
        zip_with(col("__pa"), col("__pb"),
          (a, b) => when(a === 255 || b === 255, lit(0)).otherwise(abs(a - b))),
        lit(0L), (acc, x) => acc + x))
      .filter(col("masked_l1") <= maxMaskedL1)
      .drop("__pa", "__pb")

  /** REAL-PNG near-dup test corpus derived from `documents`: docs with
    * doc_id < maxDocId render 32×24 rasters; every group of `groupSize`
    * consecutive ids shares one gradient pattern (direction/phase from a
    * mixed group hash) and each member perturbs a 3×3 block whose
    * position depends on its within-group offset — true near-dups by
    * construction (small local edit, global structure shared), while
    * distinct groups draw unrelated gradients. Ground truth is pure
    * doc_id arithmetic (same `doc_id div groupSize`), so the check
    * face's pair count is DuckDB-verifiable without an image codec. */
  def syntheticVariantPngBlobs(spark: SparkSession, docs: DataFrame,
      groupSize: Int = 4, maxDocId: Long = 400L): DataFrame = {
    import spark.implicits._
    val ids = docs.filter(col("doc_id") < maxDocId)
      .select(col("doc_id")).as[Long]
    val gs = groupSize
    ids.mapPartitions { it =>
      it.map { id =>
        val group = id / gs
        val variant = (id % gs).toInt
        // group-determined gradient: direction + phase from a mixed hash
        val m = group * 2654435761L + 1013904223L
        val ax = 3 + ((m >>> 8) % 13L).toInt   // x slope 3..15
        val ay = 2 + ((m >>> 16) % 11L).toInt  // y slope 2..12
        val c0 = ((m >>> 24) & 0xffL).toInt
        val w = 32; val h = 24
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (ax * x + ay * y + c0) & 0xff
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        // variant-local 3×3 edit: block position from the offset
        val bx = 2 + 7 * variant
        val by = 4 + 4 * variant
        var dy = 0
        while (dy < 3) {
          var dx = 0
          while (dx < 3) {
            img.setRGB(math.min(w - 1, bx + dx), math.min(h - 1, by + dy),
              0xffffff)
            dx += 1
          }
          dy += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Blob(id, bos.toByteArray, "image/png", w, h)
      }
    }.toDF()
  }
}
