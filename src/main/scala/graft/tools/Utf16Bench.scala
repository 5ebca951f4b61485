package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import graft.sources.xlsx.{XlsxParser, XlsxWriter}

/** UTF-16 transcode cost probe (r10): the same generated workbook scanned
  * once as native UTF-8 and once with its worksheet entry re-encoded to
  * UTF-16 (with BOM) — measuring what the on-the-fly Utf16ToUtf8Stream
  * costs relative to the native byte-scanner path it feeds. Before r10 the
  * UTF-16 route fell back to the StAX row iterator (~10x slower than the
  * scanner); now it pays only the transcode.
  *
  * Run: sbt "runMain graft.tools.Utf16Bench [rows] [reps]"
  */
object Utf16Bench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 100000
    val reps = if (args.length > 1) args(1).toInt else 3
    val cols = 8
    val utf8Bytes = {
      val bos = new ByteArrayOutputStream(32 << 20)
      val data = (1 to rows).iterator.map { i =>
        Seq[Any](i.toLong, i * 1.0001, s"clerk#${i % 1000}",
          if (i % 2 == 0) "A" else "NO", i % 50 * 1.5,
          java.time.LocalDate.ofEpochDay(8000L + i % 2500),
          (i % 3 == 0), i * 3.25)
      }
      XlsxWriter.write(bos, Seq(XlsxWriter.SheetSpec("Sheet1", None, data)))
      bos.toByteArray
    }
    // re-encode ONLY the worksheet entry to UTF-16 (BOM included by the
    // UTF_16 charset) — everything else stays byte-identical
    val utf16Bytes = {
      val zin = new ZipInputStream(new ByteArrayInputStream(utf8Bytes))
      val bos = new ByteArrayOutputStream(64 << 20)
      val zout = new ZipOutputStream(bos)
      var e = zin.getNextEntry
      while (e != null) {
        val content = zin.readAllBytes()
        val out =
          if (e.getName == "xl/worksheets/sheet1.xml")
            new String(content, StandardCharsets.UTF_8)
              .getBytes(StandardCharsets.UTF_16)
          else content
        zout.putNextEntry(new ZipEntry(e.getName))
        zout.write(out)
        zout.closeEntry()
        e = zin.getNextEntry
      }
      zout.close()
      bos.toByteArray
    }
    val totalCells = rows.toLong * cols
    def mkTmp(bytes: Array[Byte], tag: String): java.io.File = {
      val f = java.io.File.createTempFile(s"utf16bench_$tag", ".xlsx")
      f.deleteOnExit()
      java.nio.file.Files.write(f.toPath, bytes)
      f
    }
    val f8 = mkTmp(utf8Bytes, "u8")
    val f16 = mkTmp(utf16Bytes, "u16")
    println(s"utf8 ${utf8Bytes.length / 1024 / 1024} MiB, " +
      s"utf16 ${utf16Bytes.length / 1024 / 1024} MiB, $rows rows x $cols cols")
    def run(f: java.io.File, tag: String, threads: Int): Double = {
      var best = Double.MaxValue
      for (r <- 1 to reps) {
        val wb = new XlsxParser.Workbook(
          () => new java.io.FileInputStream(f), Some(f))
        val t0 = System.nanoTime()
        var n = 0L
        val it = wb.rowIterator("xl/worksheets/sheet1.xml", threads)
        while (it.hasNext) { val (_, cells) = it.next(); n += cells.length }
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        println(f"$tag threads=$threads rep $r: $sec%.3f s, ${n / sec / 1e6}%.2f M cells/s")
      }
      best
    }
    val b8 = run(f8, "utf8 ", 1)
    val b16 = run(f16, "utf16", 1)
    println(f"single-core: utf8 ${totalCells / b8 / 1e6}%.2f M cells/s, " +
      f"utf16 ${totalCells / b16 / 1e6}%.2f M cells/s " +
      f"(transcode overhead ${b16 / b8}%.2fx)")
    val b8p = run(f8, "utf8 ", 4)
    val b16p = run(f16, "utf16", 4)
    println(f"4 workers:   utf8 ${totalCells / b8p / 1e6}%.2f M cells/s, " +
      f"utf16 ${totalCells / b16p / 1e6}%.2f M cells/s " +
      f"(transcode overhead ${b16p / b8p}%.2fx)")
  }
}
