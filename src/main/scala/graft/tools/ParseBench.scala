package graft.tools

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import graft.sources.xlsx.{XlsxParser, XlsxWriter}

/** Single-core parser throughput probe (no Spark): writes one lineitem-like
  * sheet in memory, then measures cells/s through `Workbook.rowIterator` —
  * the same path a DSv2 partition reader drives. The reference's published
  * single-thread number is ≈3.4M cells/s (README.md:63-68 at SF1); this
  * prints ours so parser work is measured, not guessed.
  *
  * Run: sbt "runMain graft.tools.ParseBench [rows] [reps]"
  */
object ParseBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 200000
    val reps = if (args.length > 1) args(1).toInt else 5
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
      bos.toByteArray
    }
    println(s"xlsx bytes: ${bytes.length / 1024 / 1024} MiB, $rows rows x $cols cols")
    val totalCells = rows.toLong * cols
    var best = Double.MaxValue
    for (r <- 1 to reps) {
      val wb = new XlsxParser.Workbook(() => new ByteArrayInputStream(bytes))
      val t0 = System.nanoTime()
      var n = 0L
      val it = wb.rowIterator("xl/worksheets/sheet1.xml")
      while (it.hasNext) { val (_, cells) = it.next(); n += cells.length }
      val sec = (System.nanoTime() - t0) / 1e9
      best = math.min(best, sec)
      println(f"rep $r: $sec%.3f s, ${n / sec / 1e6}%.2f M cells/s (cells=$n)")
    }
    println(f"best: ${totalCells / best / 1e6}%.2f M cells/s single-core")
  }
}
