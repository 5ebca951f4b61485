package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal plumbing spec (SURVEY.md §2.3 #47): the binary+metadata
  * schema, the mapPartitions decode hop, and determinism of the stub codec.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello multimodal world", "en", "src0", 22L),
    (2L, "another longer document body here", "en", "src1", 33L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("blob table has binary payload + typed metadata struct fields") {
    val b = Multimodal.blobs(docs)
    assert(b.schema("payload").dataType == BinaryType)
    assert(b.schema("format").dataType == StringType)
    assert(b.schema("width").dataType == IntegerType)
    val r = b.orderBy("doc_id").collect()(0)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") == "hello multimodal world")
  }

  test("decode pipeline is deterministic and partition-preserving") {
    val in = Multimodal.blobs(docs).repartition(2)
    val out1 = Multimodal.decodeMeta(spark, docs).orderBy("doc_id").collect()
    val out2 = Multimodal.decodeMeta(spark, docs).orderBy("doc_id").collect()
    assert(out1.map(_.toString).toSeq == out2.map(_.toString).toSeq)
    assert(out1.length == 2)
    // checksum equals the rolling hash of the payload bytes
    val blob = Multimodal.Blob(1L, "hello multimodal world".getBytes("UTF-8"), "fake/raw", 23, 23)
    assert(out1(0).getAs[Long]("checksum") == Multimodal.decodeStub(blob).checksum)
    // decode introduces no shuffle: partition count in == out
    val decodedParts = Multimodal.decodeMeta(spark, docs).rdd.getNumPartitions
    assert(decodedParts == docs.rdd.getNumPartitions)
  }

  test("real codec: generated PNG and BMP decode to actual dimensions and luminance") {
    // known images: 8x5 all-white PNG (mean luminance 255) and a 4x4 BMP
    // with the left half black, right half white (mean ~127.6)
    def pngBytes(w: Int, h: Int, fill: (Int, Int) => Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, fill(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val white = pngBytes(8, 5, (_, _) => 0xFFFFFF, "png")
    val halfBmp = pngBytes(4, 4, (x, _) => if (x < 2) 0x000000 else 0xFFFFFF, "bmp")
    val blobDf = Seq(
      (1L, white, "image/png", 8, 5),
      (2L, halfBmp, "image/bmp", 4, 4),
      (3L, "not an image".getBytes("UTF-8"), "image/png", 1, 1), // corrupt → stub
      (4L, "plain text".getBytes("UTF-8"), "fake/raw", 2, 2) // non-image → stub
    ).toDF("doc_id", "payload", "format", "width", "height")
    val out = Multimodal.decodeMetaBlobs(spark, blobDf)
      .orderBy("doc_id").collect()
    // real decode: n_pixels from the RASTER, pixel_feat = mean luminance
    assert(out(0).getAs[Long]("n_pixels") == 40L)
    assert(math.abs(out(0).getAs[Double]("pixel_feat") - 255.0) < 0.5)
    assert(out(1).getAs[Long]("n_pixels") == 16L)
    val halfLum = out(1).getAs[Double]("pixel_feat")
    assert(halfLum > 120 && halfLum < 135, s"half-white mean luminance: $halfLum")
    // corrupt image bytes fall back to the stub rather than failing the scan
    assert(out(2).getAs[Long]("n_pixels") == 1L) // stub: width*height metadata
    // non-image formats keep the stub's semantics
    val stub = Multimodal.decodeStub(
      Multimodal.Blob(4L, "plain text".getBytes("UTF-8"), "fake/raw", 2, 2))
    assert(out(3).getAs[Long]("checksum") == stub.checksum)
  }

  test("real codec: JPEG decodes to true raster dims; corrupt JPEG falls back to stub") {
    def jpgBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no jpg writer")
      bos.toByteArray
    }
    val white = jpgBytes(12, 7, 0xFFFFFF)
    val dark = jpgBytes(6, 6, 0x101010)
    val blobDf = Seq(
      (1L, white, "image/jpeg", 12, 7),
      (2L, dark, "image/jpg", 6, 6), // alias MIME spelling dispatches too
      (3L, "not a jpeg".getBytes("UTF-8"), "image/jpeg", 1, 1) // corrupt → stub
    ).toDF("doc_id", "payload", "format", "width", "height")
    val out = Multimodal.decodeMetaBlobs(spark, blobDf).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_pixels") == 84L) // 12x7 raster, not metadata
    // JPEG is lossy: all-white must stay within a couple of levels of 255
    assert(math.abs(out(0).getAs[Double]("pixel_feat") - 255.0) < 3.0)
    assert(out(1).getAs[Long]("n_pixels") == 36L)
    assert(math.abs(out(1).getAs[Double]("pixel_feat") - 16.0) < 6.0)
    val stub = Multimodal.decodeStub(
      Multimodal.Blob(3L, "not a jpeg".getBytes("UTF-8"), "image/jpeg", 1, 1))
    assert(out(2).getAs[Long]("checksum") == stub.checksum)
    assert(out(2).getAs[Long]("n_pixels") == 1L)
  }

  test("frame sampling: everyN stride, geometry, deterministic hashes") {
    import spark.implicits._
    // 1000-byte payload → 3 frames of 256 + remainder; everyN=2 keeps 0 and 2
    val text = "x" * 1000
    val one = Seq((1L, text, 1000L)).toDF("doc_id", "text", "n_chars")
    val frames = Multimodal.sampleFrames(spark, one, everyN = 2)
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 2L))
    assert(frames.map(_.getAs[Long]("frame_bytes")).toSeq == Seq(256L, 256L))
    assert(frames.map(_.getAs[Long]("ts_ms")).toSeq == Seq(0L, 66L)) // 2*1000/30
    // a short blob still yields exactly one frame row
    val tiny = Seq((2L, "ab", 2L)).toDF("doc_id", "text", "n_chars")
    val tf = Multimodal.sampleFrames(spark, tiny, everyN = 10).collect()
    assert(tf.length == 1 && tf(0).getAs[Long]("frame_bytes") == 2L)
    // hashes are deterministic and differ across distinct frame content
    val varied = Seq((3L, ('a' to 'z').mkString * 40, 1040L)).toDF("doc_id", "text", "n_chars")
    val h1 = Multimodal.sampleFrames(spark, varied, everyN = 1)
      .orderBy("frame_idx").collect().map(_.getAs[Long]("frame_hash"))
    val h2 = Multimodal.sampleFrames(spark, varied, everyN = 1)
      .orderBy("frame_idx").collect().map(_.getAs[Long]("frame_hash"))
    assert(h1.toSeq == h2.toSeq)
    assert(h1.distinct.length > 1, "distinct frame spans should hash differently")
  }

  test("resize: real bilinear fit into the box, passthrough for corrupt, no-op when fits") {
    def png(w: Int, h: Int, fill: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, fill(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val big = png(64, 32, (x, _) => if (x < 32) 0x000000 else 0xFFFFFF)
    val small = png(8, 5, (_, _) => 0x808080)
    val blobDf = Seq(
      (1L, big, "image/png", 64, 32),
      (2L, small, "image/png", 8, 5),
      (3L, "not an image".getBytes("UTF-8"), "image/png", 9, 7)
    ).toDF("doc_id", "payload", "format", "width", "height")
    val out = Multimodal.resizeBlobs(spark, blobDf, maxDim = 16)
      .orderBy("doc_id").collect()
    // 64x32 fits to 16x8 (integer arithmetic), and the OUTPUT payload
    // really is a 16x8 raster whose halves keep their tones
    assert((out(0).getAs[Int]("out_w"), out(0).getAs[Int]("out_h")) == (16, 8))
    val r1 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).getAs[Array[Byte]]("payload")))
    assert(r1.getWidth == 16 && r1.getHeight == 8)
    assert((r1.getRGB(2, 4) & 0xFF) < 64, "left half should stay dark")
    assert((r1.getRGB(13, 4) & 0xFF) > 192, "right half should stay light")
    // already fits: geometry unchanged, payload still decodable at 8x5
    assert((out(1).getAs[Int]("out_w"), out(1).getAs[Int]("out_h")) == (8, 5))
    val r2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1).getAs[Array[Byte]]("payload")))
    assert(r2.getWidth == 8 && r2.getHeight == 5)
    // corrupt: passthrough bytes + metadata dims, scan never fails
    assert((out(2).getAs[Int]("out_w"), out(2).getAs[Int]("out_h")) == (9, 7))
    assert(new String(out(2).getAs[Array[Byte]]("payload"), "UTF-8") == "not an image")
    // fitDims integer contract pins the oracle arithmetic
    assert(Multimodal.fitDims(64, 32, 16) == ((16, 8)))
    assert(Multimodal.fitDims(3, 48, 16) == ((1, 16)))
    assert(Multimodal.fitDims(10, 10, 16) == ((10, 10)))
  }

  /** In-memory animated GIF: `fills(i)` paints frame i a solid color;
    * every frame carries a GraphicControlExtension delay of `delayCs`. */
  private def animatedGif(w: Int, h: Int, fills: Seq[Int], delayCs: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    fills.foreach { rgb =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = meta.getAsTree(fmt).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = {
        val existing = tree.getElementsByTagName("GraphicControlExtension")
        if (existing.getLength > 0)
          existing.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        else {
          val node = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
          node.setAttribute("disposalMethod", "none")
          node.setAttribute("userInputFlag", "FALSE")
          node.setAttribute("transparentColorFlag", "FALSE")
          node.setAttribute("transparentColorIndex", "0")
          tree.appendChild(node)
          node
        }
      }
      gce.setAttribute("delayTime", delayCs.toString)
      meta.setFromTree(fmt, tree)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("video frames: animated GIF demuxes to true per-frame rasters and times") {
    import spark.implicits._
    // 5 frames, alternating white/black, 10 cs (=100 ms) per frame
    val fills = Seq(0xFFFFFF, 0x000000, 0xFFFFFF, 0x000000, 0xFFFFFF)
    val gif = animatedGif(6, 4, fills, delayCs = 10)
    val blobDf = Seq(
      (1L, gif, "image/gif", 6, 4),
      (2L, "not a gif".getBytes("UTF-8"), "image/gif", 1, 1) // corrupt → stub
    ).toDF("doc_id", "payload", "format", "width", "height")
    val out = Multimodal.sampleFrameBlobs(spark, blobDf, everyN = 2)
      .orderBy("doc_id", "frame_idx").collect()
    val real = out.filter(_.getAs[Long]("doc_id") == 1L)
    // everyN=2 over 5 frames keeps 0, 2, 4
    assert(real.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 2L, 4L))
    // true presentation times: 100 ms per frame accumulated over ALL frames
    assert(real.map(_.getAs[Long]("ts_ms")).toSeq == Seq(0L, 200L, 400L))
    // decoded ARGB raster size, not a byte-span length
    assert(real.forall(_.getAs[Long]("frame_bytes") == 4L * 6 * 4))
    // content hashes: white frames agree with each other, differ from black;
    // and the run is deterministic
    val hashes = real.map(_.getAs[Long]("frame_hash"))
    assert(hashes(0) == hashes(1) && hashes(1) == hashes(2),
      s"all-sampled frames are white, hashes: ${hashes.toSeq}")
    val all = Multimodal.sampleFrameBlobs(spark, blobDf.filter(col("doc_id") === 1L),
      everyN = 1).orderBy("frame_idx").collect().map(_.getAs[Long]("frame_hash"))
    assert(all.length == 5)
    assert(all(0) == all(2) && all(2) == all(4), "white frames hash equal")
    assert(all(1) == all(3), "black frames hash equal")
    assert(all(0) != all(1), "white and black frames hash apart")
    // corrupt GIF bytes fall back to the stub path, not a failure
    val stubRows = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(stubRows.length == 1 && stubRows(0).getAs[Long]("frame_bytes") == 9L)
  }

  test("audio fingerprint: decoded energy-delta bits match the " +
      "generator's closed form; corrupt bytes yield the -1 stub") {
    val docsDf = Seq((0L, 100L), (1L, 200L), (2L, 300L), (3L, 50L))
      .toDF("doc_id", "n_chars")
    val wavs = Multimodal.syntheticWavBlobs(spark, docsDf)
    val out = Multimodal.audioFingerprintBlobs(spark, wavs)
      .orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("fp")))).toMap
    // closed-form replay: s(i) = ((id·31 + i·17) % 65536) − 32768 over
    // the interleaved sample index — the decode must recover it exactly
    for ((id, nc) <- Seq(0L -> 100L, 1L -> 200L, 2L -> 300L, 3L -> 50L)) {
      val n = ((nc % 256 + 64) * (id % 2 + 1)).toInt
      val e = new Array[Long](16)
      for (i <- 0 until n)
        e(((i.toLong * 16L) / n).toInt) +=
          math.abs(((id * 31 + i * 17) % 65536) - 32768)
      val fp = (1 until 16).map(w => if (e(w) > e(w - 1)) 1L << w else 0L).sum
      assert(out(id) == ((n.toLong, fp)), s"doc $id")
    }
    val bad = Multimodal.audioFingerprint(
      Multimodal.Blob(9L, "not audio".getBytes("UTF-8"), "audio/wav", 0, 0))
    assert(bad.n_samples == 0L && bad.fp == -1L)
  }

  test("audio VAD: frame energies over the real decode match the hand " +
      "replay; silence/speech runs counted; corrupt bytes yield the stub") {
    val docsDf = Seq((0L, 100L), (3L, 50L), (6L, 260L))
      .toDF("doc_id", "n_chars")
    val wavs = Multimodal.syntheticSpeechWavBlobs(spark, docsDf)
    val out = Multimodal.vadBlobs(spark, wavs).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    for ((id, nc) <- Seq(0L -> 100L, 3L -> 50L, 6L -> 260L)) {
      val n = (nc % 256 + 64).toInt
      val frames = (n + 31) / 32
      val acts = (0 until frames).map { f =>
        val start = f * 32
        val end = math.min(start + 32, n)
        val sum = (start until end).map(i =>
          if ((i / 32) % 2 == 0) 0L
          else math.abs(((id * 31 + i * 17) % 65536) - 32768)).sum
        sum > 1000L * (end - start)
      }
      val r = out(id)
      assert(r.getAs[Long]("n_frames") == frames.toLong, s"doc $id frames")
      assert(r.getAs[Long]("n_active") == acts.count(identity).toLong,
        s"doc $id active")
      assert(r.getAs[Long]("first_active") ==
        acts.indexWhere(identity).toLong, s"doc $id first")
      val segs = acts.zip(false +: acts).count { case (a, p) => a && !p }
      assert(r.getAs[Long]("n_segments") == segs.toLong, s"doc $id segs")
      // the plant guarantees live signal: odd frames active, even silent
      assert(r.getAs[Long]("n_active") > 0 && r.getAs[Long]("n_active") <
        r.getAs[Long]("n_frames"), s"doc $id degenerate")
    }
    val bad = Multimodal.vad(
      Multimodal.Blob(9L, "not audio".getBytes("UTF-8"), "audio/wav", 0, 0))
    assert(bad.n_frames == -1L && bad.first_active == -1L)
  }

  test("audio: generated WAV demuxes to true geometry; corrupt bytes pass through") {
    val docsDf = Seq(
      (0L, 100L), (1L, 200L), (2L, 300L), (3L, 50L))
      .toDF("doc_id", "n_chars")
    val wavs = Multimodal.syntheticWavBlobs(spark, docsDf)
    // payloads are real RIFF/WAVE containers
    val payloads = wavs.orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    assert(payloads.values.forall(p =>
      new String(p.take(4), "US-ASCII") == "RIFF" &&
        new String(p.slice(8, 12), "US-ASCII") == "WAVE"))
    val out = Multimodal.audioMetaBlobs(spark, wavs).orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // header-recovered geometry matches the generator's integer formulas
    for ((id, nc) <- Seq(0L -> 100L, 1L -> 200L, 2L -> 300L, 3L -> 50L)) {
      val r = out(id)
      val sr = Seq(8000L, 16000L, 32000L)((id % 3).toInt)
      val nf = nc % 256 + 64
      assert(r.getAs[Long]("sample_rate") == sr)
      assert(r.getAs[Long]("channels") == id % 2 + 1)
      assert(r.getAs[Long]("bits") == 16L)
      assert(r.getAs[Long]("n_frames") == nf)
      assert(r.getAs[Long]("duration_ms") == nf * 1000L / sr)
    }
    // amplitude hash: deterministic across runs, different across clips
    val again = Multimodal.audioMetaBlobs(spark, wavs).orderBy("doc_id").collect()
      .map(_.getAs[Long]("amp_hash")).toSeq
    assert(again == out.toSeq.sortBy(_._1).map(_._2.getAs[Long]("amp_hash")))
    assert(again.distinct.length == again.length, "clips hash apart")
    // corrupt payload: stub row, not a failure
    val corrupt = Seq((9L, "definitely not audio".getBytes("UTF-8"), "audio/wav", 0, 0))
      .toDF("doc_id", "payload", "format", "width", "height")
    val stub = Multimodal.audioMetaBlobs(spark, corrupt).collect()(0)
    assert(stub.getAs[Long]("sample_rate") == 0L &&
      stub.getAs[Long]("n_frames") == 20L)
  }
}
