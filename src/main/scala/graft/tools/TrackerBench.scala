package graft.tools

import java.io.ByteArrayOutputStream

import graft.sources.xlsx.{RowBoundaryTracker, XlsxWriter}

/** Micro-benchmark for [[RowBoundaryTracker]] alone — the chunk producer's
  * boundary scan is the sequential floor of the intra-file parallel parse
  * pipeline (IngestProbe shows it dominating the producer), so its MB/s IS
  * the ceiling on single-workbook ingest rate regardless of worker count.
  * Run: sbt "runMain graft.tools.TrackerBench [rows] [reps]"
  */
object TrackerBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 600000
    val reps = if (args.length > 1) args(1).toInt else 7
    // Same row shape as the lineitem ingest fixture: 3 numerics + 2 strings
    val bytes = {
      val bos = new ByteArrayOutputStream(64 << 20)
      val data = (1 to rows).iterator.map { i =>
        Seq[Any](i.toLong, i % 50 * 1.25, i * 1.0001,
          if (i % 2 == 0) "A" else "NO", if (i % 3 == 0) "O" else "F")
      }
      XlsxWriter.write(bos, Seq(XlsxWriter.SheetSpec("Sheet1", None, data)))
      bos.toByteArray
    }
    // pull the inflated sheet XML out of the zip (timed: inflate is the
    // OTHER sequential pipeline stage — whichever of inflate/scan is slower
    // bounds the producer)
    def inflateOnce(): Array[Byte] = {
      val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
      var out: Array[Byte] = null
      var e = zin.getNextEntry
      while (e != null && out == null) {
        if (e.getName == "xl/worksheets/sheet1.xml") {
          val bos = new ByteArrayOutputStream(128 << 20)
          val buf = new Array[Byte](1 << 16)
          var n = zin.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = zin.read(buf) }
          out = bos.toByteArray
        }
        e = zin.getNextEntry
      }
      zin.close()
      out
    }
    var xml: Array[Byte] = inflateOnce()
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      xml = inflateOnce()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  inflate(ZipInputStream): $s%.3f s  ${xml.length / s / 1e6}%.1f MB/s")
    }
    // ZipFile path (what a local-file Workbook actually uses)
    locally {
      val tmp = java.io.File.createTempFile("trackerbench", ".xlsx")
      tmp.deleteOnExit()
      java.nio.file.Files.write(tmp.toPath, bytes)
      val zf = new java.util.zip.ZipFile(tmp)
      val entry = zf.getEntry("xl/worksheets/sheet1.xml")
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val in = zf.getInputStream(entry)
        val buf = new Array[Byte](1 << 20)
        var total = 0L
        var n = in.read(buf)
        while (n >= 0) { total += n; n = in.read(buf) }
        in.close()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"  inflate(ZipFile): $s%.3f s  ${total / s / 1e6}%.1f MB/s")
      }
      zf.close()
    }
    println(f"sheet xml: ${xml.length / 1024.0 / 1024.0}%.1f MiB, $rows rows")
    // floor probe 1: pure byte-wise '<' count (the minimal per-byte loop)
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      var q = 0
      var n = 0L
      while (q < xml.length) { if (xml(q) == '<') n += 1; q += 1 }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  bytewise '<' count: $s%.3f s  ${xml.length / s / 1e6}%.1f MB/s  ($n tags)")
    }
    // floor probe 2: SWAR 8-bytes-at-a-time '<' count
    locally {
      val vh = java.lang.invoke.MethodHandles.byteArrayViewVarHandle(
        classOf[Array[Long]], java.nio.ByteOrder.LITTLE_ENDIAN)
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        var q = 0
        var n = 0L
        val lim = xml.length - 8
        val pat = 0x3c3c3c3c3c3c3c3cL // '<' replicated
        while (q <= lim) {
          val w = vh.get(xml, q).asInstanceOf[Long] ^ pat
          // zero-byte detector
          val z = (w - 0x0101010101010101L) & ~w & 0x8080808080808080L
          n += java.lang.Long.bitCount(z)
          q += 8
        }
        while (q < xml.length) { if (xml(q) == '<') n += 1; q += 1 }
        val s = (System.nanoTime() - t0) / 1e9
        println(f"  SWAR '<' count: $s%.3f s  ${xml.length / s / 1e6}%.1f MB/s  ($n tags)")
      }
    }
    val slice = 1 << 20
    for (_ <- 1 to reps) {
      val tracker = new RowBoundaryTracker
      val t0 = System.nanoTime()
      var p = 0
      var boundaries = 0L
      while (p < xml.length) {
        val to = math.min(p + slice, xml.length)
        if (tracker.scan(xml, p, to) >= 0) boundaries += 1
        p = to
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  scan: $s%.3f s  ${xml.length / s / 1e6}%.1f MB/s  (slices w/ boundary: $boundaries)")
    }
  }
}
