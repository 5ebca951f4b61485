package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import graft.sources.xlsx.{XlsxParser, XlsxWriter}

/** Decomposes the parallel-parse pipeline cost: pure inflate drain vs
  * inflate + row-boundary tracking vs full single-core parse. The producer
  * stage of [[graft.sources.xlsx.ParallelSheetScanner]] is inflate+track —
  * its throughput is the ceiling on intra-file parallel speedup.
  *
  * Run: sbt "runMain graft.tools.ScanProbe [rows]"
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 300000
    val cols = 8
    val bytes = {
      val bos = new ByteArrayOutputStream(64 << 20)
      val data = (1 to rows).iterator.map { i =>
        Seq[Any](i.toLong, i * 1.0001, s"clerk#${i % 1000}",
          if (i % 2 == 0) "A" else "NO", i % 50 * 1.5,
          java.time.LocalDate.ofEpochDay(8000L + i % 2500), (i % 3 == 0), i * 3.25)
      }
      XlsxWriter.write(bos, Seq(XlsxWriter.SheetSpec("Sheet1", None, data)))
      bos.toByteArray
    }
    def entryStream() = {
      val wb = new XlsxParser.Workbook(() => new ByteArrayInputStream(bytes))
      wb.entryStreamForProbe("xl/worksheets/sheet1.xml")
    }
    // measure inflated size + pure inflate time
    val buf = new Array[Byte](1 << 20)
    for (rep <- 1 to 3) {
      val (in, close) = entryStream()
      var total = 0L
      val t0 = System.nanoTime()
      var n = in.read(buf)
      while (n >= 0) { total += n; n = in.read(buf) }
      close()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"inflate only:    ${total / 1e6}%.1f MB in $s%.3f s = ${total / s / 1e6}%.0f MB/s")
    }
    for (rep <- 1 to 3) {
      val (in, close) = entryStream()
      val tracker = new graft.sources.xlsx.RowBoundaryTracker
      var total = 0L
      var nb = 0L
      val t0 = System.nanoTime()
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) { if (tracker.scan(buf, 0, n) >= 0) nb += 1; total += n }
        n = in.read(buf)
      }
      close()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"inflate + track: ${total / 1e6}%.1f MB in $s%.3f s = ${total / s / 1e6}%.0f MB/s (chunks w/ boundary: $nb)")
    }
    // track only, from a pre-inflated image: the tracker thread's own ceiling
    val image = {
      val (in, close) = entryStream()
      val bos = new ByteArrayOutputStream(128 << 20)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) bos.write(buf, 0, n); n = in.read(buf) }
      close()
      bos.toByteArray
    }
    for (rep <- 1 to 3) {
      val tracker = new graft.sources.xlsx.RowBoundaryTracker
      val t0 = System.nanoTime()
      var p = 0
      var nb = 0L
      while (p < image.length) {
        val e = math.min(p + (1 << 20), image.length)
        if (tracker.scan(image, p, e) >= 0) nb += 1
        p = e
      }
      val s = (System.nanoTime() - t0) / 1e9
      println(f"track only:      ${image.length / 1e6}%.1f MB in $s%.3f s = ${image.length / s / 1e6}%.0f MB/s (w/ boundary: $nb)")
    }
  }
}
