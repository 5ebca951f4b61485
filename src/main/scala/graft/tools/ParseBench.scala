package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import graft.sources.xlsx.{XlsxParser, XlsxWriter}

/** Parser throughput probe (no Spark): writes one lineitem-like sheet in
  * memory, then measures cells/s through `Workbook.rowIterator` — the same
  * path a DSv2 partition reader drives — single-core AND with the chunked
  * parallel scanner at 2/4/8 workers on the SAME single file (the
  * reference's `threads` scenario; its published curve is ≈13.5 s at 1
  * thread → ≈7 s at 4 on SF1 lineitem, i.e. ~1.9× — README.md:63-68).
  *
  * Run: sbt "runMain graft.tools.ParseBench [rows] [reps]"
  */
object ParseBench {
  /** Re-encode a workbook WITHOUT the graft row-group index parts — a
    * "foreign" file, as any non-graft writer would produce it, so the
    * streaming (index-less) pipeline is what gets measured. */
  private def stripIndex(src: Array[Byte]): Array[Byte] = {
    val zin = new java.util.zip.ZipInputStream(new ByteArrayInputStream(src))
    val bos = new ByteArrayOutputStream(src.length)
    val zout = new java.util.zip.ZipOutputStream(bos)
    val buf = new Array[Byte](1 << 16)
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.getName.startsWith("xl/graft/")) {
        zout.putNextEntry(new java.util.zip.ZipEntry(e.getName))
        var n = zin.read(buf)
        while (n > 0) { zout.write(buf, 0, n); n = zin.read(buf) }
        zout.closeEntry()
      }
      e = zin.getNextEntry
    }
    zout.close()
    bos.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 200000
    val reps = if (args.length > 1) args(1).toInt else 5
    val foreign = args.length > 2 && args(2) == "foreign"
    val cols = 8
    val bytes = {
      val bos = new ByteArrayOutputStream(64 << 20)
      val data = (1 to rows).iterator.map { i =>
        Seq[Any](
          i.toLong, // integral double
          i * 1.0001, // fractional double
          s"clerk#${i % 1000}", // inline string
          if (i % 2 == 0) "A" else "NO", // short string
          i % 50 * 1.5, // double
          java.time.LocalDate.ofEpochDay(8000L + i % 2500), // date
          (i % 3 == 0), // boolean
          i * 3.25 // double
        )
      }
      XlsxWriter.write(bos, Seq(XlsxWriter.SheetSpec("Sheet1", None, data)))
      val raw = bos.toByteArray
      if (foreign) stripIndex(raw) else raw
    }
    if (foreign) println("mode: FOREIGN (row-group index stripped — " +
      "streaming/speculative pipeline)")
    println(s"xlsx bytes: ${bytes.length / 1024 / 1024} MiB, $rows rows x $cols cols")
    val totalCells = rows.toLong * cols
    // a real single-big-workbook scan opens a local file (ZipFile seeks);
    // a ByteArrayInputStream-only workbook would re-stream the 10+ MB zip
    // for every metadata entry and overstate the sequential fraction
    val tmp = java.io.File.createTempFile("parsebench", ".xlsx")
    tmp.deleteOnExit()
    java.nio.file.Files.write(tmp.toPath, bytes)
    def run(threads: Int): Double = {
      var best = Double.MaxValue
      for (r <- 1 to reps) {
        val wb = new XlsxParser.Workbook(
          () => new java.io.FileInputStream(tmp), Some(tmp))
        val t0 = System.nanoTime()
        var n = 0L
        val it = wb.rowIterator("xl/worksheets/sheet1.xml", threads)
        while (it.hasNext) { val (_, cells) = it.next(); n += cells.length }
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        println(f"threads=$threads rep $r: $sec%.3f s, ${n / sec / 1e6}%.2f M cells/s (cells=$n)")
      }
      best
    }
    val t1 = run(1)
    println(f"best: ${totalCells / t1 / 1e6}%.2f M cells/s single-core")
    Seq(2, 4, 8, 16).foreach { th =>
      val t = run(th)
      println(f"best: ${totalCells / t / 1e6}%.2f M cells/s at $th workers " +
        f"(${t1 / t}%.2fx vs single)")
    }
    if (foreign) {
      // controlled A/B of the speculative-tracking producer vs the
      // sequential-tracker pipeline: both modes INTERLEAVED in this one
      // JVM (the host's speed oscillates rep to rep — a mode per process
      // would measure the machine, not the code)
      println("== speculative-tracking A/B (interleaved) ==")
      def run1(threads: Int, mode: String): Double = {
        sys.props("graft.spectrack") = mode
        try {
          val wb = new XlsxParser.Workbook(
            () => new java.io.FileInputStream(tmp), Some(tmp))
          val t0 = System.nanoTime()
          val it = wb.rowIterator("xl/worksheets/sheet1.xml", threads)
          while (it.hasNext) it.next()
          (System.nanoTime() - t0) / 1e9
        } finally sys.props.remove("graft.spectrack")
      }
      Seq(2, 4, 8).foreach { th =>
        var bOld, bSpec = Double.MaxValue
        for (_ <- 1 to reps) {
          bOld = math.min(bOld, run1(th, "never"))
          bSpec = math.min(bSpec, run1(th, "always"))
        }
        println(f"t=$th: sequential-track ${totalCells / bOld / 1e6}%.2f " +
          f"M cells/s vs speculative ${totalCells / bSpec / 1e6}%.2f " +
          f"(${bOld / bSpec}%.2fx)")
      }
    }
  }
}
